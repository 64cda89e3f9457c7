"""Environment state pytrees.

The reference keeps env state in Python object attributes
(track_1v1.py:42-69,134-158); here it is a struct-of-arrays pytree so the
whole engine runs vectorized under jit/vmap with static shapes.
"""

from __future__ import annotations

from typing import Any, Dict

import chex
import jax.numpy as jnp

from active_tracking_rl_tpu.config import EnvConfig


@chex.dataclass(frozen=True)
class EnvState:
    """Per-row environment state.

    All randomness is consumed at reset time (map, spawns, scripted-opponent
    action tape); `step` is deterministic. This is the TPU-native replacement
    for the reference's global-NumPy-RNG mutation during episodes
    (generators.py:41,56 — see SURVEY.md §2.1 determinism hazards).
    """

    #: wall map padded with `pob_size` wall cells on every side, uint8 {0,1}.
    #: Pre-padding makes the egocentric crop a single dynamic_slice
    #: (track_1v1.py:316-323 pads on demand instead).
    maze: chex.Array
    #: agent positions, (num_agents, 2) int32, UNPADDED coordinates (row, col).
    pos: chex.Array
    #: scripted-target action tape, (tape_len,) int8. Zeros for dueling modes.
    tape: chex.Array
    #: steps taken in this episode, int32.
    t: chex.Array
    #: consecutive steps with distance > pob_size (track_1v1.py:106-111), int32.
    c_far: chex.Array
    #: episode terminated flag (lost-target or TimeLimit), bool.
    done: chex.Array
    #: cumulative per-agent reward this episode, (num_agents,) float32.
    c_reward: chex.Array
    #: cumulative wall collisions per agent (track_1v1.py:87), (num_agents,) int32.
    c_collision: chex.Array
    #: tracker-target euclidean distance after the last step, float32.
    dist: chex.Array


# chex dataclasses are not auto-registered with flax.serialization (unlike
# flax.struct ones); register EnvState so full-train-state checkpoints
# (rl/checkpoint.py) can round-trip it through to_state_dict/from_state_dict.
def _envstate_to_state_dict(x: EnvState):
    from flax import serialization
    return {f: serialization.to_state_dict(getattr(x, f))
            for f in x.__dataclass_fields__}


def _envstate_from_state_dict(x: EnvState, sd):
    from flax import serialization
    return x.replace(**{f: serialization.from_state_dict(getattr(x, f), sd[f])
                        for f in x.__dataclass_fields__})


def _register_serialization():
    from flax import serialization
    serialization.register_serialization_state(
        EnvState, _envstate_to_state_dict, _envstate_from_state_dict)


_register_serialization()


def zeros_like_state(cfg: EnvConfig) -> EnvState:
    """A template EnvState with correct shapes/dtypes (single row)."""
    s = cfg.maze_size + 2 * cfg.pob_size
    n = cfg.num_agents
    return EnvState(
        maze=jnp.ones((s, s), jnp.uint8),
        pos=jnp.zeros((n, 2), jnp.int32),
        tape=jnp.zeros((cfg.tape_len,), jnp.int8),
        t=jnp.zeros((), jnp.int32),
        c_far=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), jnp.bool_),
        c_reward=jnp.zeros((n,), jnp.float32),
        c_collision=jnp.zeros((n,), jnp.int32),
        dist=jnp.zeros((), jnp.float32),
    )


def info_dict(state: EnvState) -> Dict[str, Any]:
    """Step info. The reference's `traces`/`traces_relative` lists
    (track_1v1.py:116-123) are host-side rendering aids; the render path
    collects trajectories outside jit instead."""
    return {
        "distance": state.dist,
        "collision": state.c_collision,
        "eps_len": state.t,
    }
