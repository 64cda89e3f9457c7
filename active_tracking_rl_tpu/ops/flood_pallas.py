"""Pallas TPU kernel for BFS distance-field relaxation.

Contract-identical to ``envs.distance.distance_fields`` (the XLA reference
implementation and test oracle): min-plus flood fill over a 4-connected grid,
``iters`` synchronous relaxation sweeps, walls and unreached cells at INF.

Why a kernel: the XLA version runs ``iters`` (typically 256) iterations of a
``fori_loop`` whose (S, S) carry round-trips HBM every sweep. Here the whole
(G, S, S) field block stays **VMEM-resident** for all sweeps — one HBM read
of the initial field + maze, one write of the result. The scripted-opponent
reset path (``envs/opponents.py:nav_candidates``) computes G=16 fields per
env row per episode, so this dominates reset-pool cost on TPU.

Layout: S (81/82) is padded by the Mosaic compiler to lane width; the
neighbor shifts are implemented with ``pltpu.roll`` + boundary masks, so the
padding lanes never contaminate real cells (rolled-in values are masked to
INF at the grid edges anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF32 = 16000  # plain int: jnp scalars would be captured consts in the kernel

#: goal-field block per kernel program; G is blocked by this.
_G_BLOCK = 8


#: convergence-check cadence: run this many sweeps, then compare against the
#: pre-chunk field and exit when nothing changed (relaxation is idempotent at
#: the fixpoint). Amortizes the full-array compare+reduce to ~3% overhead.
_CHECK_EVERY = 16


def _relax_kernel(iters: int, maze_ref, d0_ref, out_ref):
    """One program: relax a (Gb, S, S) field block to convergence.

    BFS distance needs one sweep per unit of eccentricity from the goal
    (typically 100-180 on these maps); `iters` is only the safety cap — the
    while_loop exits as soon as a _CHECK_EVERY-sweep chunk changes nothing.
    """
    wall = (maze_ref[:] != 0)[None, :, :]          # (1, S, S) -> broadcast
    s0, s1 = d0_ref.shape[1], d0_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 2)
    first_r = rows == 0
    last_r = rows == s0 - 1
    first_c = cols == 0
    last_c = cols == s1 - 1

    def sweep(_, d):
        # neighbor value arriving from row-1 / row+1 / col-1 / col+1;
        # grid-edge arrivals masked to INF (no wraparound neighbors).
        # pltpu.roll requires non-negative shifts: size-1 == circular -1.
        from_up = jnp.where(first_r, INF32, pltpu.roll(d, 1, axis=1))
        from_dn = jnp.where(last_r, INF32, pltpu.roll(d, s0 - 1, axis=1))
        from_lf = jnp.where(first_c, INF32, pltpu.roll(d, 1, axis=2))
        from_rt = jnp.where(last_c, INF32, pltpu.roll(d, s1 - 1, axis=2))
        best = jnp.minimum(jnp.minimum(from_up, from_dn),
                           jnp.minimum(from_lf, from_rt))
        nd = jnp.minimum(d, best + 1)
        return jnp.where(wall, INF32, nd)

    def cond(c):
        _, i, changed = c
        return changed & (i < iters)

    def chunk(c):
        d, i, _ = c
        nd = jax.lax.fori_loop(0, _CHECK_EVERY, sweep, d)
        return nd, i + _CHECK_EVERY, jnp.any(nd != d)

    d, _, _ = jax.lax.while_loop(
        cond, chunk, (d0_ref[:], jnp.int32(0), jnp.bool_(True)))
    out_ref[:] = d


def _sweep_kernel(max_rounds: int, cap: int, maze_ref, d0_ref, out_ref,
                  dtype=jnp.int32):
    """Fast-sweeping variant: per round, Gauss-Seidel directional passes
    (rows fwd/bwd, cols fwd/bwd), each a LOG-DEPTH min-plus prefix scan
    implemented with power-of-two `pltpu.roll` steps — so one round
    propagates whole straight-line runs instead of one cell. A shortest
    path alternating between vertical and horizontal segments z times
    converges in ~z/2+1 rounds (3-6 on block maps, 10-30 on mazes) vs one
    relaxation sweep per unit of path length in `_relax_kernel`.

    Composition scanned per direction: T_i(x) = min(c_i, x + k_i) with
    c = current field, k = 1 at free cells / INF at walls (so nothing
    propagates through a wall); combine(b=current, a=behind):
    c' = min(c_b, c_a + k_b), k' = sat(k_a + k_b). Applying the composed
    prefix to x = INF yields exactly the in-row one-directional BFS update.

    `cap`: distances beyond this are mapped to INF afterwards, matching the
    iteration-capped relaxation semantics (paths longer than flood_iters
    count as unreachable -> navigator planB, envs/opponents.py).
    """
    # All masks as 0/1 integer arithmetic: captured (1,S,S) boolean vectors
    # trip a Mosaic relayout bug ("non-singleton logical dimension is
    # replicated in destination but not in source" on vector<1xSxSxi1>).
    # `dtype=int16` halves VMEM traffic; all quantities fit: INF=16000 and
    # the saturating adds cap at 2*INF=32000 < int16 max.
    dt = dtype
    inf = jnp.asarray(INF32, dt)
    wall = jnp.minimum(maze_ref[:].astype(dt), 1)[None, :, :]
    s0, s1 = d0_ref.shape[1], d0_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 2)
    kstep = jnp.asarray(1, dt) + wall * (inf - jnp.asarray(1, dt))

    def scan_dir(d, axis, reverse):
        n = s0 if axis == 1 else s1
        idx = rows if axis == 1 else cols
        c, k = d, kstep
        shift = 1
        while shift < n:   # static python loop: log2(n) steps, unrolled
            if reverse:
                arr_c = pltpu.roll(c, n - shift, axis=axis)
                arr_k = pltpu.roll(k, n - shift, axis=axis)
                # edge = idx >= n - shift, as a 0/1 integer mask (see above)
                m = jnp.clip(idx - (n - shift) + 1, 0, 1).astype(dt)
            else:
                arr_c = pltpu.roll(c, shift, axis=axis)
                arr_k = pltpu.roll(k, shift, axis=axis)
                # edge = idx < shift
                m = jnp.clip(shift - idx, 0, 1).astype(dt)
            # identity element at the edge: (c, k) = (INF, 0)
            arr_c = jnp.maximum(arr_c, m * inf)          # m=1 -> INF
            arr_k = arr_k * (jnp.asarray(1, dt) - m)     # m=1 -> 0
            c = jnp.minimum(c, jnp.minimum(arr_c + k, inf))
            k = jnp.minimum(k + arr_k, inf)
            shift *= 2
        return jnp.maximum(c, wall * inf)   # walls pinned to INF

    def one_round(d):
        d = scan_dir(d, 1, False)
        d = scan_dir(d, 1, True)
        d = scan_dir(d, 2, False)
        return scan_dir(d, 2, True)

    def cond(c):
        d, prev, i = c
        return (i < max_rounds) & jnp.any(d != prev)

    def body(c):
        d, _, i = c
        return one_round(d), d, i + 1

    d0 = d0_ref[:].astype(dt)
    d, _, _ = jax.lax.while_loop(cond, body, (one_round(d0), d0, jnp.int32(1)))
    out_ref[:] = jnp.where(d > jnp.asarray(cap, dt), inf, d).astype(jnp.int32)


def _init_fields(maze: jax.Array, goals: jax.Array) -> jax.Array:
    """(S,S) uint8 x (G,2) i32 -> (G,S,S) i32 initial field (0 at goal).

    Built with a broadcast-compare mask, NOT `.at[goal].set`: the scatter
    formulation silently dropped most seeds under nested vmap at batch
    >= ~128 (jax 0.9.0, CPU and TPU) — whole fields came out INF, so on-TPU
    navigators degraded to planB random walks. Regression-tested at pool
    scale in tests/test_flood_pallas.py.
    """
    s = maze.shape[-1]
    wall = maze != 0
    rows = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)

    def one(g):
        is_goal = (rows == g[0]) & (cols == g[1]) & ~wall
        return jnp.where(is_goal, 0, INF32)

    return jax.vmap(one)(goals)


#: safety cap on fast-sweeping rounds (each round handles 2 more direction
#: alternations of the shortest path). 128 gives 2x headroom over the
#: theoretical worst case for the default cap (flood_iters=256 -> up to
#: ~128 path segments -> ~65 rounds); the loop exits early on convergence,
#: so typical cost is unchanged.
_MAX_ROUNDS = 128


@functools.partial(jax.jit, static_argnames=("iters", "interpret", "variant"))
def flood_fields_pallas(maze: jax.Array, goals: jax.Array,
                        iters: int, interpret: bool = False,
                        variant: str = "relax") -> jax.Array:
    """(S,S) uint8, (G,2) i32 -> (G,S,S) int16 distance fields.

    G must be a multiple of _G_BLOCK or <= _G_BLOCK (padded internally).
    ``interpret=True`` runs the Pallas interpreter (CPU testing).
    ``variant``: "relax" (one cell per sweep, early-converging) or "sweep"
    (fast sweeping — log-depth directional scans, far fewer rounds).
    """
    g = goals.shape[0]
    d0 = _init_fields(maze, goals)
    gb = min(g, _G_BLOCK)
    pad = (-g) % gb
    if pad:
        d0 = jnp.concatenate(
            [d0, jnp.full((pad,) + d0.shape[1:], INF32)], axis=0)
    gp = d0.shape[0]
    s = maze.shape[-1]

    if variant == "sweep":
        kernel = functools.partial(_sweep_kernel, _MAX_ROUNDS, iters)
    elif variant == "sweep16":
        # int16 carry halves VMEM traffic and is oracle-exact (values cap at
        # 2*INF = 32000 < int16 max), but current Mosaic cannot lower it:
        # "not implemented: Rotate with non-32-bit data" (pltpu.roll).
        # Interpret-mode only until Mosaic grows 16-bit rotate support.
        kernel = functools.partial(_sweep_kernel, _MAX_ROUNDS, iters,
                                   dtype=jnp.int16)
    else:
        kernel = functools.partial(_relax_kernel, iters)
    out = pl.pallas_call(
        kernel,
        grid=(gp // gb,),
        in_specs=[
            pl.BlockSpec((s, s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s, s), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s, s), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gp, s, s), jnp.int32),
        interpret=interpret,
    )(maze, d0)
    return out[:g].astype(jnp.int16)


def flood_available() -> bool:
    """True when the default backend can run the Mosaic kernel."""
    try:
        return jax.default_backend() == "tpu" or _is_axon()
    except Exception:
        return False


def _is_axon() -> bool:
    try:
        dev = jax.devices()[0]
        return "TPU" in (getattr(dev, "device_kind", "") or "")
    except Exception:
        return False
