"""Typed configuration system.

Replaces the reference's argparse + stringly-typed dispatch
(``main.py:16-50``; substring matching on env ids / network names at
``environment.py:12``, ``model.py:107-124,230``) with dataclasses. The env-id
grammar and all 72 registered ids are reproduced from
``envs/gym-track2d/gym_track2d/__init__.py:3-18`` of the reference.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Optional, Tuple

MAP_TYPES = ("Maze", "Block", "Empty")
OBS_TYPES = ("Full", "Partial")
TARGET_MODES = ("Adv", "PZR", "Far", "Nav", "Ram", "RPF")
LEVELS = (0, 1)

#: Target modes where the env overrides the target action with a scripted
#: policy (reference track_1v1.py:80-84). Adv/PZR/Far are the dueling modes.
SCRIPTED_MODES = ("Nav", "Ram", "RPF")


def env_ids() -> Tuple[str, ...]:
    """All 72 registered env ids (reference gym_track2d/__init__.py:3-18)."""
    out = []
    for m, o, t, lvl in itertools.product(MAP_TYPES, OBS_TYPES, TARGET_MODES, LEVELS):
        out.append(f"Track2D-{m}{o}{t}-v{lvl}")
    return tuple(out)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration — one compiled program per config.

    Field semantics follow ``Track1v1Env.__init__`` (track_1v1.py:14-69).
    """

    map_type: str = "Block"          # Maze | Block | Empty
    obs_type: str = "Partial"        # Full | Partial
    target_mode: str = "PZR"         # Adv | PZR | Far | Nav | Ram | RPF
    level: int = 0
    pob_size: int = 6                # partial window half-size (track_1v1.py:16)
    action_type: str = "VonNeumann"  # VonNeumann (4) | Moore (8)
    num_agents: int = 2
    max_episode_steps: int = 500     # gym TimeLimit (gym_track2d/__init__.py:17)

    # --- TPU-engine knobs (no reference counterpart) ---
    #: action-tape length for scripted targets; >= max_episode_steps + 1.
    tape_len: int = 512
    #: number of pre-sampled navigator goal candidates per episode. The
    #: reference samples goals lazily at each replan (navigator.py:15-38);
    #: we pre-sample a pool and cycle if exhausted (rare; plan lengths are
    #: typically tens of steps, so <= ~12 replans per 500-step episode).
    nav_goal_candidates: int = 16
    #: BFS flood-fill relaxation iterations; paths longer than this are
    #: treated as unreachable, which maps onto the reference's "unsolvable ->
    #: resample/planB" branch (navigator.py:22-35).
    flood_iters: int = 256
    #: distance-field backend: "auto" (Pallas kernel on TPU, XLA elsewhere),
    #: "xla", or "pallas" (see envs/distance.py:distance_fields_backend).
    flood_backend: str = "auto"
    #: TRAINING AID for Full-obs configs (round-5 investigation, RESULTS.md
    #: §1.9): cyclically roll each agent's full-map observation so the
    #: observer sits at the center cell. NOT reference behavior — off for
    #: all registered ids, cross-checks, and golden fixtures; enable with
    #: the trainer's --center-full-obs.
    center_full_obs: bool = False

    # ----- derived static geometry -----
    @property
    def maze_size(self) -> int:
        """Grid side length including boundary walls.

        Maze: ((80//2)*2+1) = 81 (generators.py:120 with width=height=80);
        Block/Empty: 80 + 2-cell wall pad = 82 (generators.py:158-176).
        """
        if self.map_type == "Maze":
            return ((80 // 2) * 2) + 1
        return 80 + 2

    @property
    def num_actions(self) -> int:
        return 4 if self.action_type == "VonNeumann" else 8

    @property
    def pob_window(self) -> int:
        return 2 * self.pob_size + 1

    @property
    def scripted(self) -> bool:
        return self.target_mode in SCRIPTED_MODES

    @property
    def w_p(self) -> float:
        """Partial-zero-sum penalty weight (track_1v1.py:147-152)."""
        if self.target_mode == "PZR":
            return 1.0
        if self.target_mode == "Far":
            return -0.5
        return 0.0

    @property
    def obs_shape(self) -> Tuple[int, int]:
        if self.obs_type == "Full":
            return (self.maze_size, self.maze_size)
        return (self.pob_window, self.pob_window)


def parse_env_id(env_id: str) -> EnvConfig:
    """``Track2D-{Map}{Obs}{Target}-v{level}`` -> EnvConfig."""
    if not env_id.startswith("Track2D-"):
        raise ValueError(f"not a Track2D env id: {env_id!r}")
    body, _, ver = env_id[len("Track2D-"):].partition("-v")
    level = int(ver)
    for m in MAP_TYPES:
        if body.startswith(m):
            rest = body[len(m):]
            for o in OBS_TYPES:
                if rest.startswith(o):
                    target = rest[len(o):]
                    if target in TARGET_MODES and level in LEVELS:
                        return EnvConfig(map_type=m, obs_type=o,
                                         target_mode=target, level=level)
    raise ValueError(f"unknown env id: {env_id!r}")


@dataclasses.dataclass(frozen=True)
class NetConfig:
    """Network architecture config.

    Mirrors the reference's network-name grammar
    ``{tat-}?{cnn|icml|maze}-{lstm|gru}{-continuous}?`` (model.py:107-124,230;
    main.py:32). ``from_name`` accepts the same names.
    """

    encoder: str = "maze"       # cnn | icml | maze
    rnn: str = "lstm"           # lstm | gru | none
    tat: bool = True            # tracker-aware target (model.py:230-233)
    continuous: bool = False
    rnn_out: int = 128          # main.py:47
    stack_frames: int = 1       # main.py:45
    aux_reward: bool = True     # --aux reward (main.py:33)
    #: mixed precision: cast matmul/conv inputs (activations + weights) to
    #: bfloat16 so they tile onto the MXU at double rate; accumulation,
    #: biases, gate nonlinearities and both heads stay float32. Params are
    #: stored float32 — checkpoints are precision-independent.
    bf16: bool = False

    @property
    def compute_dtype(self):
        import jax.numpy as _jnp
        return _jnp.bfloat16 if self.bf16 else _jnp.float32

    @classmethod
    def from_name(cls, name: str, rnn_out: int = 128, stack_frames: int = 1,
                  aux: str = "reward") -> "NetConfig":
        enc = "maze" if "maze" in name else ("icml" if "icml" in name else "cnn")
        rnn = "lstm" if "lstm" in name else ("gru" if "gru" in name else "none")
        return cls(
            encoder=enc,
            rnn=rnn,
            tat="tat" in name,
            continuous="continuous" in name,
            rnn_out=rnn_out,
            stack_frames=stack_frames,
            aux_reward="reward" in aux,
        )

    @property
    def name(self) -> str:
        parts = []
        if self.tat:
            parts.append("tat")
        parts.append(self.encoder)
        if self.rnn != "none":
            parts.append(self.rnn)
        if self.continuous:
            parts.append("continuous")
        return "-".join(parts)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (defaults = reference main.py:17-50)."""

    env_id: str = "Track2D-BlockPartialPZR-v0"
    env_base: str = "Track2D-BlockPartialNav-v0"   # eval env (main.py:27)
    lr: float = 1e-3
    gamma: float = 0.9
    tau: float = 1.0
    entropy: float = 0.01            # tracker entropy weight
    entropy_target: float = 0.2      # target entropy weight (player_util.py:121-124)
    seed: int = 1
    num_steps: int = 20              # rollout length T
    max_step: int = 150_000          # iteration budget (main.py:49)
    test_eps: int = 100
    optimizer: str = "Adam"          # Adam | RMSprop
    amsgrad: bool = True
    train_mode: int = -1             # 0 tracker, 1 target, -1 joint, 2 alternating
    init_step: int = -1              # tracker-only warmup iters (main.py:50)
    #: alternation period for the target phase of train_mode=2. The reference
    #: references args.adv_step (test.py:90) but never defines it (the flag is
    #: missing from argparse — spec'd-but-broken); we define it properly.
    adv_step: int = 500
    grad_clip: float = 50.0          # player_util.py:157
    split: bool = True               # save player0/player1 separately (main.py:43)

    # ----- sync-batch execution (replaces workers=N Hogwild) -----
    num_envs: int = 1024             # vectorized env batch per replica
    #: reset-pool rows generated per learner iteration; fresh episodes are
    #: drawn from this pool when rows terminate mid-rollout.
    reset_pool: int = 256

    log_dir: str = "logs"
    checkpoint_every: int = 200      # learner iterations between eval+ckpt
    #: bfloat16 matmul/conv inputs in the model (f32 params, f32 heads) —
    #: forwarded into NetConfig.bf16 by the trainer CLI.
    bf16: bool = False
    #: rematerialize the model forward inside the rollout scan: the backward
    #: pass recomputes encoder/RNN intermediates from the (uint8) frame
    #: stack instead of stacking full-precision residuals per scan step —
    #: the residual-stacking dynamic-update-slices were ~25% of core
    #: self-time in the round-4 xprof (XPROF_SUMMARY.json). Bit-identical
    #: gradients (pure recomputation), so this is a pure perf knob.
    remat: bool = False


# README-reproducing presets (README.md:52,63,67,71,97,104).
PRESETS = {
    # AD-VAT 2D: tat target + PZR reward, joint training
    "advat-2d": TrainConfig(env_id="Track2D-BlockPartialPZR-v0",
                            env_base="Track2D-BlockPartialNav-v0",
                            train_mode=-1),
    # naive dueling: plain A3C target, Adv reward, low target entropy
    "naive-dueling-2d": TrainConfig(env_id="Track2D-BlockPartialAdv-v0",
                                    env_base="Track2D-BlockPartialNav-v0",
                                    entropy_target=0.01, train_mode=-1),
    # tracker-only baselines vs scripted targets
    "tracker-nav-2d": TrainConfig(env_id="Track2D-BlockPartialNav-v0",
                                  train_mode=0),
    "tracker-ram-2d": TrainConfig(env_id="Track2D-BlockPartialRam-v0",
                                  env_base="Track2D-BlockPartialRam-v0",
                                  train_mode=0),
}


def preset(name: str) -> TrainConfig:
    return PRESETS[name]


def net_config_for(train_cfg: TrainConfig, network: Optional[str] = None) -> NetConfig:
    """Default network per the reference README: tat-maze-lstm for dueling
    (README.md:52), maze-lstm for naive dueling / tracker-only (README.md:71)."""
    if network is not None:
        return NetConfig.from_name(network)
    cfg = parse_env_id(train_cfg.env_id)
    if cfg.target_mode in ("PZR", "Far") and train_cfg.train_mode != 0:
        return NetConfig.from_name("tat-maze-lstm")
    return NetConfig.from_name("maze-lstm", aux="none")
