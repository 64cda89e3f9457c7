"""Device mesh construction and sharding for the learner.

The reference's "distributed backend" is single-node POSIX shared memory +
multiprocessing Manager lists (SURVEY.md §2.8: main.py:86,103-105,
utils.py:36-44). The TPU-native replacement:

  * one process per host, `jax.distributed.initialize` (`host_init`),
  * a Mesh with axes ('dp', 'tp'): the env batch is sharded over 'dp'
    (hosts x chips), parameters are replicated ('tp' exists for API
    completeness at size 1 — the model is ~0.5M params, SURVEY.md §2.8),
  * gradient reduction is inserted by pjit from the shardings (psum over
    ICI within a slice, DCN across slices),
  * control decisions (curriculum mode, best-checkpoint) are computed from
    replicated scalars so every host acts identically — no Manager-list
    analog is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    dp: int = -1   # -1: all devices
    tp: int = 1


def host_init(coordinator: Optional[str] = None, num_processes: int = 1,
              process_id: int = 0) -> None:
    """Multi-host SPMD entry (replaces mp.Process spawning, main.py:106-116).

    Call BEFORE any other jax API touches the backend. After this,
    `jax.devices()` is the global device list, `jax.local_devices()` this
    host's; the same jitted SPMD program runs on every process and XLA
    routes the gradient all-reduce over ICI within a slice / DCN across
    (SURVEY.md §2.8). Wired to the trainer CLI via
    --coordinator/--num-processes/--process-id.
    """
    if num_processes > 1:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return   # already initialized (early CLI hook) — idempotent
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(spec: MeshSpec = MeshSpec(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp = len(devices) // spec.tp if spec.dp == -1 else spec.dp
    arr = np.array(devices[: dp * spec.tp]).reshape(dp, spec.tp)
    return Mesh(arr, ("dp", "tp"))


def shard_learner(mesh: Mesh, learner_state, model_axes=None):
    """Place a LearnerState: params/opt_state replicated, carry sharded on dp.

    Returns the re-placed state. The train step jitted with these shardings
    gets its gradient all-reduce inserted automatically by XLA.
    """
    repl = NamedSharding(mesh, P())
    multiproc = jax.process_count() > 1

    def put_leaf(x, sh):
        # Across processes, device_put of a locally-committed jax.Array to a
        # sharding with non-addressable devices is rejected; hand XLA the
        # host value instead (identical on every process — all init flows
        # from the same PRNG key), letting each process place its shards.
        if multiproc:
            x = np.asarray(x)
        return jax.device_put(x, sh)

    def put(tree, sh_tree):
        return jax.tree_util.tree_map(put_leaf, tree, sh_tree)

    shs = learner_shardings(mesh, learner_state)
    return type(learner_state)(
        params=put(learner_state.params, shs[0]),
        opt_state=put(learner_state.opt_state, shs[1]),
        carry=put(learner_state.carry, shs[2]),
        step=put_leaf(learner_state.step, repl),
    )


def carry_shardings(mesh: Mesh, carry, num_envs: int):
    """Shard carry leaves with a leading env-batch dim over 'dp'; replicate
    the rest (e.g. the PRNG key)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("dp"))

    def pick(x):
        return data if (x.ndim >= 1 and x.shape[0] == num_envs) else repl

    return jax.tree_util.tree_map(pick, carry)


def learner_shardings(mesh: Mesh, learner_state):
    """(shardings for (params, opt_state, carry, mode)) for jit placement."""
    repl = NamedSharding(mesh, P())
    tree_sh = lambda tree, sh: jax.tree_util.tree_map(lambda _: sh, tree)
    num_envs = learner_state.carry.hx.shape[0]
    return (tree_sh(learner_state.params, repl),
            tree_sh(learner_state.opt_state, repl),
            carry_shardings(mesh, learner_state.carry, num_envs),
            repl)
