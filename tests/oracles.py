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
    """track_1v1.py:296-307 (_get_full_obs): paint agents in index order,
    later paint wins on overlap; NO own-cell repaint — both observers see
    the same painted maze (agent_id is unused, kept for signature parity)."""
    del agent_id
    full = maze.copy().astype(np.int64)
    full[pos[0][0], pos[0][1]] = 2
    full[pos[1][0], pos[1][1]] = 4
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


def navigator_sim(maze: np.ndarray, spawn, first_goal, rng, ticks):
    """Reference Navigator semantics oracle (navigator.py:11-63): replans
    fire on plan exhaustion ONLY (`_goal_test` is dead code — numpy goals
    match neither isinstance branch, navigator.py:65-70); each replan samples
    FRESH uniform goals (up to 6 tries, navigator.py:22-31) before falling
    back to 10 random actions (planB); movement is greedy shortest-path
    descent (stands in for A*: same path lengths, tie-break may differ).
    Returns (track, n_replans)."""
    s = maze.shape[0]
    free = np.argwhere(maze == 0)
    pos = tuple(int(x) for x in spawn)

    def plan(pos, goal):
        for trial in range(6):
            d = bfs_distance(maze, goal)
            if 1 <= d[pos[0], pos[1]] < 16000:
                return False, goal, d, int(d[pos[0], pos[1]])
            goal = tuple(free[rng.randint(len(free))])
        return True, goal, None, 10

    planb, goal, field, remaining = plan(pos, tuple(int(x) for x in first_goal))
    track = [pos]
    n_replans = 0
    for _ in range(ticks):
        if remaining <= 0:
            n_replans += 1
            goal = tuple(free[rng.randint(len(free))])
            planb, goal, field, remaining = plan(pos, goal)
        if planb:
            a = int(rng.randint(4))
        else:
            vals = [field[pos[0] + dr, pos[1] + dc]
                    if 0 <= pos[0] + dr < s and 0 <= pos[1] + dc < s else 16000
                    for dr, dc in DELTAS[:4]]
            a = int(np.argmin(vals))
        pos, _ = next_state(maze, pos, a)
        track.append(pos)
        remaining -= 1
    return track, n_replans


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
