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
_G_BLOCK = 16


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


def _sweep_kernel(max_rounds: int, cap: int, gb: int, maze_ref, goals_ref,
                  out_ref, dtype=jnp.int32):
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

    The k side of the composition depends only on the wall pattern, NOT on
    the evolving field — so the whole k-chain (one (1,S,S) plane per
    direction per doubling level, edge lanes folded in as INF) is
    precomputed once before the convergence loop. The in-loop step is then
    just c = min(c, roll(c) + K'), 3 vector ops per level instead of ~8
    (edge arrivals: garbage + INF saturates past `inf` and is clamped by
    the running min, exactly reproducing the old explicit edge mask).

    Goal seeds are built IN-kernel from an SMEM (Gb,2) goal list rather
    than streamed in as (G,S,S) initial fields — saves writing+reading the
    full field block through HBM per call (the profile's biggest non-sweep
    cost). An out-of-range goal (e.g. -1,-1) yields an all-INF field
    (used for block padding).

    `cap`: distances beyond this are mapped to INF afterwards, matching the
    iteration-capped relaxation semantics (paths longer than flood_iters
    count as unreachable -> navigator planB, envs/opponents.py).
    """
    # All masks as 0/1 integer arithmetic: captured (1,S,S) boolean vectors
    # trip a Mosaic relayout bug ("non-singleton logical dimension is
    # replicated in destination but not in source" on vector<1xSxSxi1>).
    dt = dtype

    def roll(x, r, axis):
        # pltpu.roll cannot lower 16-bit rotates ("Rotate with non-32-bit
        # data"), but a slice+concat circular shift CAN — equal to
        # jnp.roll(x, r, axis), verified on-chip. Keep the native rotate
        # for 32-bit.
        if x.dtype == jnp.int32:
            return pltpu.roll(x, r, axis=axis)
        if axis == 1:
            return jnp.concatenate([x[:, -r:, :], x[:, :-r, :]], axis=1)
        return jnp.concatenate([x[:, :, -r:], x[:, :, :-r]], axis=2)

    inf = jnp.asarray(INF32, dt)
    wall = jnp.minimum(maze_ref[:].astype(dt), 1)[None, :, :]
    s0, s1 = out_ref.shape[1], out_ref.shape[2]
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, s0, s1), 2)
    kstep = jnp.asarray(1, dt) + wall * (inf - jnp.asarray(1, dt))

    def kchain(axis, reverse):
        """Precompute K'_j = (k at doubling level j, edge lanes -> INF)."""
        n = s0 if axis == 1 else s1
        idx = rows if axis == 1 else cols
        k = kstep
        out = []
        shift = 1
        while shift < n:
            if reverse:
                arr_k = roll(k, n - shift, axis)
                # edge = idx >= n - shift, as a 0/1 integer mask (see above)
                m = jnp.clip(idx - (n - shift) + 1, 0, 1).astype(dt)
            else:
                arr_k = roll(k, shift, axis)
                # edge = idx < shift
                m = jnp.clip(shift - idx, 0, 1).astype(dt)
            out.append(jnp.maximum(k, m * inf))          # K'_j
            arr_k = arr_k * (jnp.asarray(1, dt) - m)     # identity at edge
            k = jnp.minimum(k + arr_k, inf)
            shift *= 2
        return out

    chains = {(axis, rev): kchain(axis, rev)
              for axis in (1, 2) for rev in (False, True)}

    def scan_dir(d, axis, reverse):
        # Two ops per level (roll+add, min): the explicit min(..., inf)
        # clamp is redundant — c starts <= INF and only decreases, and
        # arrivals cap at 2*INF = 32000 (no i32 overflow) — and walls need
        # no re-pinning because k = INF at walls makes every arrival into a
        # wall >= INF (d0 already has walls at INF). The kernel is VMEM-
        # bandwidth-bound, so dropping these two full-block passes is a
        # direct ~1.5x on the sweep loop.
        n = s0 if axis == 1 else s1
        c = d
        shift = 1
        for kp in chains[(axis, reverse)]:
            r = (n - shift) if reverse else shift
            c = jnp.minimum(c, roll(c, r, axis) + kp)
            shift *= 2
        return c

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

    # in-kernel goal seeding (SMEM scalars -> broadcast compares)
    planes = []
    for gi in range(gb):
        is_goal = ((rows == goals_ref[gi, 0]) & (cols == goals_ref[gi, 1])
                   & (wall == 0))
        planes.append(jnp.where(is_goal, jnp.asarray(0, dt), inf))
    d0 = jnp.concatenate(planes, axis=0)

    d, _, _ = jax.lax.while_loop(cond, body, (one_round(d0), d0, jnp.int32(1)))
    out_ref[:] = jnp.where(d > jnp.asarray(cap, dt), inf, d).astype(
        out_ref.dtype)


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
    gb = min(g, _G_BLOCK)
    pad = (-g) % gb
    gp = g + pad
    s = maze.shape[-1]

    if variant in ("sweep", "sweep16"):
        # sweep kernels seed goals in-kernel from SMEM ((-1,-1) pad rows
        # match no cell -> all-INF field, same as the old INF d0 padding).
        # sweep16: int16 carry would halve VMEM traffic (the kernel's
        # bound) and is oracle-exact (values cap at 2*INF = 32000 <
        # int16 max), but remains interpret-mode only: beyond the known
        # 16-bit pltpu.roll gap (worked around via slice+concat, see
        # roll()), this image's Mosaic toolchain fails to compile even a
        # trivial i16 while-loop carry or a (1,S,S) i16 broadcast
        # (probed round 5; remote-compile HTTP 500 with no diagnostics).
        goals_p = goals
        if pad:
            goals_p = jnp.concatenate(
                [goals, jnp.full((pad, 2), -1, goals.dtype)], axis=0)
        kernel = functools.partial(
            _sweep_kernel, _MAX_ROUNDS, iters, gb,
            dtype=jnp.int16 if variant == "sweep16" else jnp.int32)
        out = pl.pallas_call(
            kernel,
            grid=(gp // gb,),
            in_specs=[
                pl.BlockSpec((s, s), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gb, 2), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((gb, s, s), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gp, s, s), jnp.int16),
            interpret=interpret,
        )(maze, goals_p)
        return out[:g]

    d0 = _init_fields(maze, goals)
    if pad:
        d0 = jnp.concatenate(
            [d0, jnp.full((pad,) + d0.shape[1:], INF32)], axis=0)
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
