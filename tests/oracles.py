"""NumPy test oracles implementing the reference *semantics* (written from
the spec in SURVEY.md §2.1 with file:line citations; the reference package
itself is not importable here — no gym/skimage in the image)."""

from __future__ import annotations

import numpy as np

DELTAS = [(-1, 0), (1, 0), (0, -1), (0, 1),
          (-1, 1), (1, 1), (-1, -1), (1, -1)]  # track_1v1.py:276-279


def next_state(maze: np.ndarray, state, action):
    """track_1v1.py:271-285: wall -> stay + collision flag."""
    d = DELTAS[action]
    new = (state[0] + d[0], state[1] + d[1])
    if maze[new[0], new[1]] == 1:
        return state, True
    return new, False


def rewards(pos0, pos1, w_p, pob=6.0):
    """track_1v1.py:94-104."""
    d = float(np.linalg.norm(np.array(pos1, float) - np.array(pos0, float)))
    r0 = max(1.0 - 2.0 * d / pob, -1.0)
    r1 = max(-r0 - w_p * max(d - pob, 0.0) / pob, -1.0)
    return r0, r1, d


def partial_obs(maze: np.ndarray, pos, agent_id, pob=6):
    """track_1v1.py:295-326: paint both agents (tracker 2, target 4, later
    paint wins), repaint own cell, crop (2*pob+1)^2 with wall padding."""
    full = maze.copy().astype(np.int64)
    full[pos[0][0], pos[0][1]] = 2
    full[pos[1][0], pos[1][1]] = 4
    full[pos[agent_id][0], pos[agent_id][1]] = 2 + 2 * agent_id
    pad = np.pad(full, pob, constant_values=1)
    r, c = pos[agent_id][0], pos[agent_id][1]
    return pad[r:r + 2 * pob + 1, c:c + 2 * pob + 1]


def full_obs(maze: np.ndarray, pos, agent_id):
    full = maze.copy().astype(np.int64)
    full[pos[0][0], pos[0][1]] = 2
    full[pos[1][0], pos[1][1]] = 4
    full[pos[agent_id][0], pos[agent_id][1]] = 2 + 2 * agent_id
    return full


def bfs_distance(maze: np.ndarray, goal) -> np.ndarray:
    """Plain BFS shortest-path lengths; oracle for the flood fill."""
    from collections import deque
    s = maze.shape[0]
    INF = 16000
    d = np.full((s, s), INF, np.int32)
    if maze[goal[0], goal[1]] == 1:
        return d
    d[goal[0], goal[1]] = 0
    q = deque([tuple(goal)])
    while q:
        r, c = q.popleft()
        for dr, dc in DELTAS[:4]:
            nr, nc = r + dr, c + dc
            if 0 <= nr < s and 0 <= nc < s and maze[nr, nc] == 0 \
                    and d[nr, nc] > d[r, c] + 1:
                d[nr, nc] = d[r, c] + 1
                q.append((nr, nc))
    return d


def gae_reference(rewards_t, values_t, bootstrap, gamma, tau):
    """player_util.py:128-140 for a single no-done segment: returns
    (R_t, gae_t) arrays, time-major, values_t excludes bootstrap."""
    T = len(rewards_t)
    R = bootstrap
    gae = 0.0
    Rs = np.zeros(T)
    gaes = np.zeros(T)
    values_ext = list(values_t) + [bootstrap]
    for i in reversed(range(T)):
        R = gamma * R + rewards_t[i]
        delta = rewards_t[i] + gamma * values_ext[i + 1] - values_ext[i]
        gae = gae * gamma * tau + delta
        Rs[i] = R
        gaes[i] = gae
    return Rs, gaes
