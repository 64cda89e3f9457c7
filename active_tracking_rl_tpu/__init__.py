"""active_tracking_rl_tpu — a TPU-native (JAX/XLA/pjit/Pallas) framework with the
capabilities of zfw1226/active_tracking_rl (AD-VAT, ICLR'19).

Design stance (see SURVEY.md §7): the reference's process-per-worker Hogwild
A3C is an artifact of CPU PyTorch. This framework keeps the *semantics*
(two-player dueling A2C updates with GAE, entropy asymmetry, tracker-aware
target, scripted opponents, curriculum switching, best-checkpoint selection)
and re-architects the *execution* TPU-first:

  * the gym-track2d environment family becomes a pure-JAX vectorized engine
    stepping thousands of instances in lockstep under jit
    (`active_tracking_rl_tpu.envs`),
  * per-step A* navigation becomes reset-time BFS distance fields compiled
    into per-episode action tapes (`envs/opponents.py`),
  * the CNN+LSTM policies become batched flax modules
    (`active_tracking_rl_tpu.models`),
  * the shared-memory parameter server becomes a synchronous sharded learner
    over a `jax.sharding.Mesh` (`active_tracking_rl_tpu.parallel`, `rl/learner.py`).
"""

__version__ = "0.1.0"

from active_tracking_rl_tpu.config import (  # noqa: F401
    EnvConfig,
    NetConfig,
    TrainConfig,
    env_ids,
    parse_env_id,
)
