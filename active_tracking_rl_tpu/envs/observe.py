"""Observation kernels.

Partial obs (track_1v1.py:309-326): a (2*pob+1)^2 egocentric crop around each
agent, wall-padded at map borders, with agents painted 2+2*i (tracker 2,
target 4) and the observing agent's own color winning on overlap
(track_1v1.py:300-313). The reference re-pads the maze per call; here the
maze is stored pre-padded with `pob_size` wall cells so the crop is a single
`lax.dynamic_slice`, and agents are painted inside the 13x13 crop (instead of
scattering into the full map and copying it per agent).

Full obs (track_1v1.py:295-307): the whole painted maze per agent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig


def _paint_in_crop(crop: jax.Array, rel: jax.Array, color: int,
                   window: int) -> jax.Array:
    """Set crop[rel] = color iff rel lies inside the window.

    Masked COMPARE over the (w, w) crop, not a scatter: under vmap a
    per-row dynamic scatter lowers to a sequential per-row loop on TPU
    (xprof round-4: the scatter/gather pair was 80% of the train-step core
    at 4096 envs), while the compare is one fused elementwise op.
    """
    ri = jax.lax.broadcasted_iota(jnp.int32, (window, window), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (window, window), 1)
    inside = ((rel >= 0) & (rel < window)).all()
    mask = (ri == rel[0]) & (ci == rel[1]) & inside
    return jnp.where(mask, jnp.uint8(color), crop)


def _crop_onehot_matmul(maze_padded: jax.Array, origin: jax.Array,
                        w: int) -> jax.Array:
    """(S,S) uint8 crop of shape (w, w) at `origin`, as two one-hot matmuls:
    crop = R @ maze @ C^T with R[a, j] = [j == origin_r + a].

    Under vmap this is a batched dot_general on the MXU — the direct
    per-row `dynamic_slice` gather lowers to a 4096-iteration sequential
    dynamic-slice/dynamic-update loop on TPU (216 ms/agent per 20-step
    iteration, xprof round-4) vs ~1 ms for the matmuls. bfloat16 is exact
    here: operands are one-hot selectors and cell values 0..6.
    """
    s = maze_padded.shape[-1]
    a = jax.lax.broadcasted_iota(jnp.int32, (w, s), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (w, s), 1)
    rows = (j == origin[0] + a).astype(jnp.bfloat16)       # (w, S)
    cols = (j == origin[1] + a).astype(jnp.bfloat16)       # (w, S)
    m = maze_padded.astype(jnp.bfloat16)
    crop = rows @ m @ cols.T                               # (w, w)
    return crop.astype(jnp.uint8)


def partial_obs(cfg: EnvConfig, maze_padded: jax.Array,
                pos: jax.Array) -> jax.Array:
    """-> (num_agents, 2*pob+1, 2*pob+1) uint8."""
    w = cfg.pob_window
    p = cfg.pob_size

    ri = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    center = (ri == p) & (ci == p)

    def one(i):
        # pos is unpadded; padded crop origin = pos + p - p = pos.
        crop = _crop_onehot_matmul(maze_padded, pos[i], w)
        j = 1 - i  # the other agent (num_agents == 2)
        rel = pos[j] - pos[i] + p
        crop = _paint_in_crop(crop, rel, 2 + 2 * j, w)
        # own cell painted last -> own color wins on overlap
        # (track_1v1.py:313). Masked compare, NOT crop.at[p,p].set: the
        # vmapped .at-update lowers to a full dynamic-update-slice rewrite
        # of the (B,13,13) buffer per agent per step — with the (13,13)
        # minor dims tiled to (16,128) that one-pixel write was the
        # hottest op PAIR in the round-4/5 core xprof (2 x 13% self-time).
        return jnp.where(center, jnp.uint8(2 + 2 * i), crop)

    return jnp.stack([one(0), one(1)])


def full_obs(cfg: EnvConfig, maze_padded: jax.Array, pos: jax.Array) -> jax.Array:
    """-> (num_agents, S, S) uint8 (track_1v1.py:287-307).

    The reference paints agents in index order with NO own-cell repaint
    (`_get_full_obs`, track_1v1.py:296-307): on tracker/target overlap both
    observers see the later paint (color 4). Only the *partial* obs repaints
    the observer's own color (track_1v1.py:313). Both agents therefore see
    the identical painted maze.
    """
    p = cfg.pob_size
    s = cfg.maze_size
    maze = jax.lax.dynamic_slice(maze_padded, (p, p), (s, s))
    # Masked compares, not .at[].set scatters: a per-row dynamic scatter
    # under vmap lowers to a sequential per-row loop on TPU (§3.2c of
    # RESULTS.md; same pathology as the partial-obs crop).
    ri = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    painted = jnp.where((ri == pos[0, 0]) & (ci == pos[0, 1]),
                        jnp.uint8(2), maze)
    painted = jnp.where((ri == pos[1, 0]) & (ci == pos[1, 1]),
                        jnp.uint8(4), painted)
    if cfg.center_full_obs:
        # Egocentric centering — a TRAINING AID, not reference behavior
        # (off for all 72 registered ids and every cross-check): cyclically
        # roll each agent's copy of the painted map so the observer sits at
        # the center cell. Full-obs training collapses without it (round-4
        # investigation, RESULTS.md §1.9): the policy must first localize
        # two single-pixel agents in an 82x82 frame. Centering removes the
        # localization problem — the same egocentricity the 13x13 partial
        # crop has — while keeping full-map visibility. Implemented as
        # one-hot PERMUTATION matmuls (bf16 exact for one-hot x values
        # 0..6): a vmapped jnp.roll lowers to per-row gather loops on TPU.
        c = s // 2
        ai = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
        ji = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
        m = painted.astype(jnp.bfloat16)

        def center(i):
            rows = (ji == jnp.mod(ai + pos[i, 0] - c, s)).astype(jnp.bfloat16)
            cols = (ji == jnp.mod(ai + pos[i, 1] - c, s)).astype(jnp.bfloat16)
            return (rows @ m @ cols.T).astype(jnp.uint8)

        return jnp.stack([center(0), center(1)])
    return jnp.stack([painted, painted])


def observe(cfg: EnvConfig, maze_padded: jax.Array, pos: jax.Array) -> jax.Array:
    if cfg.obs_type == "Full":
        return full_obs(cfg, maze_padded, pos)
    return partial_obs(cfg, maze_padded, pos)
