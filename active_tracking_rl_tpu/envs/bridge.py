"""Host-side gym bridge: classic gym API over the JAX engine, plus the
wrapper chain for external (non-Track2D) env families.

Parity map (reference ``environment.py``):

  * ``create_env(env_id, args)`` (environment.py:11-32)  -> :func:`create_env`
  * ``Rescale``          (environment.py:35-79)          -> :class:`Rescale`
  * ``UnrealPreprocess`` (environment.py:82-125)         -> :class:`ImagePreprocess`
  * ``frame_stack``      (environment.py:128-156)        -> :class:`FrameStack`
  * ``listspace``        (environment.py:159-175)        -> :class:`ListSpace`

Two env sources feed the chain:

  1. Track2D ids -> :class:`GymTrackEnv`, a host adapter over the pure-JAX
     :class:`~active_tracking_rl_tpu.envs.env.TrackEnv` with the reference's
     ``reset() -> obs``, ``step([a0, a1]) -> (obs, rewards, done, info)``,
     ``seed``, ``render`` surface (track_1v1.py:71-168). Use it for
     interactive work / visual debugging / porting; training uses the
     vectorized on-device path (``rl/rollout.py``).
  2. External 3D env families (the reference's ``gym_unrealcv`` UE4 envs,
     environment.py:8-9,15) -> :func:`make_external_env` behind a *lazy*
     import boundary, fixing the reference's portability hazard of importing
     ``gym_unrealcv`` unconditionally at module top (SURVEY.md §2.2). These
     run on host; ``HostEnvPool`` batches N of them behind the same
     (B, agents, ...) array interface the learner consumes, so the 3D family
     plugs into the same training loop with the model on TPU.
"""

from __future__ import annotations

import collections
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from active_tracking_rl_tpu.config import EnvConfig, parse_env_id


class GymTrackEnv:
    """Classic gym-style host adapter over the JAX Track2D engine.

    Matches ``Track1v1Env`` + ``TimeLimit`` semantics: ``reset`` regenerates
    the map (track_1v1.py:134-136); ``step`` returns per-agent obs ``(2, 1,
    H, W)`` float (channel dim prepended, track_1v1.py:323-326), rewards
    ``(2,)``, done, and the info dict (track_1v1.py:116-123).
    """

    metadata = {"render.modes": ["human", "rgb_array", "ansi"]}

    def __init__(self, env_id: str, cfg: Optional[EnvConfig] = None,
                 seed: int = 0):
        import jax

        from active_tracking_rl_tpu.envs.env import TrackEnv

        self.cfg = cfg if cfg is not None else parse_env_id(env_id)
        self.env_id = env_id
        self._env = TrackEnv(self.cfg)
        self._reset = jax.jit(self._env.reset)
        self._step = jax.jit(self._env.step)
        self._key = jax.random.PRNGKey(seed)
        self._state = None
        self._traces: List[np.ndarray] = []
        h, w = self.cfg.obs_shape
        n = self.cfg.num_agents
        self.observation_space = _BoxSpace(
            low=0.0, high=6.0, shape=(n, 1, h, w))
        self.action_space = _DiscreteSpace(self.cfg.num_actions, n)

    def seed(self, seed: Optional[int] = None):
        """Unlike the reference (whose seed() is dead — SURVEY.md §2.1), this
        actually determines all episode randomness."""
        import jax
        if seed is not None:
            self._key = jax.random.PRNGKey(seed)
        return [seed]

    def _obs_out(self, obs) -> np.ndarray:
        # (agents, H, W) uint8 -> (agents, 1, H, W) float32 (track_1v1.py:326)
        return np.asarray(obs, np.float32)[:, None]

    def reset(self) -> np.ndarray:
        import jax
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset(k)
        self._traces = [np.asarray(self._state.pos).copy()]
        return self._obs_out(obs)

    def step(self, actions: Sequence[int]):
        import jax.numpy as jnp
        assert self._state is not None, "call reset() first"
        acts = jnp.asarray(np.asarray(actions, np.int32))
        self._state, obs, rewards, done, info = self._step(self._state, acts)
        self._traces.append(np.asarray(self._state.pos).copy())
        pos = np.asarray(self._state.pos)
        info_h = {
            "distance": float(np.asarray(info["distance"])),
            "eps_len": int(np.asarray(info["eps_len"])),
            "collision": np.asarray(info["collision"]),
            # reference info extras (track_1v1.py:116-123)
            "traces": [list(t.astype(float)) for t in pos],
            "traces_relative": [
                list(((t - pos[0]).astype(float) / self.cfg.pob_size))
                for t in pos],
        }
        return (self._obs_out(obs), np.asarray(rewards, np.float32),
                bool(np.asarray(done)), info_h)

    # --- rendering (track_1v1.py:170-216) ---
    def render(self, mode: str = "human"):
        from active_tracking_rl_tpu.envs.render import render_state
        assert self._state is not None, "call reset() first"
        return render_state(self.cfg, self._state,
                            traces=self._traces, mode=mode)

    def close(self):
        pass


class _BoxSpace:
    """Minimal gym.spaces.Box stand-in (keeps gym optional)."""

    def __init__(self, low, high, shape, dtype=np.float32):
        self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

    def sample(self):
        return np.random.uniform(self.low, self.high,
                                 self.shape).astype(self.dtype)


class _DiscreteSpace:
    """Per-agent discrete action space list (listspace convention)."""

    def __init__(self, n: int, num_agents: int = 1):
        self.n = n
        self.num_agents = num_agents
        self.shape = (num_agents,)

    def sample(self):
        return np.random.randint(0, self.n, self.num_agents)


# ---------------------------------------------------------------------------
# Wrapper chain (reference environment.py:35-175), host-side.
# ---------------------------------------------------------------------------


class Wrapper:
    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self):
        return self.env.reset()

    def step(self, action):
        return self.env.step(action)


class Rescale(Wrapper):
    """[0, 255] -> [-1, 1] linear map with clipping; optional random
    per-episode inversion (environment.py:35-79, the ``--inv`` flag)."""

    def __init__(self, env, inv: bool = False):
        super().__init__(env)
        self.inv = inv
        self._sign = 1.0

    def _map(self, obs):
        obs = np.asarray(obs, np.float32)
        out = obs / 255.0 * 2.0 - 1.0
        out = np.clip(out * self._sign, -1.0, 1.0)
        return out

    def reset(self):
        if self.inv:
            self._sign = 1.0 if np.random.rand() < 0.5 else -1.0
        return self._map(self.env.reset())

    def step(self, action):
        obs, r, d, info = self.env.step(action)
        return self._map(obs), r, d, info


class ImagePreprocess(Wrapper):
    """3D-image preprocessing (reference ``UnrealPreprocess``,
    environment.py:82-125): center-crop to square, resize to
    ``input_size``, optional grayscale (channel mean), HWC -> CHW."""

    def __init__(self, env, input_size: int = 80, gray: bool = False):
        super().__init__(env)
        self.input_size = input_size
        self.gray = gray

    def _one(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape[:2]
        s = min(h, w)
        y0, x0 = (h - s) // 2, (w - s) // 2
        img = img[y0:y0 + s, x0:x0 + s]
        img = _resize(img, self.input_size)
        if self.gray:
            img = img.mean(axis=-1, keepdims=True)
        return np.moveaxis(img, -1, 0)  # HWC -> CHW

    def _map(self, obs):
        return np.stack([self._one(np.asarray(o, np.float32)) for o in obs])

    def reset(self):
        return self._map(self.env.reset())

    def step(self, action):
        obs, r, d, info = self.env.step(action)
        return self._map(obs), r, d, info


def _resize(img: np.ndarray, size: int) -> np.ndarray:
    """Bilinear resize without a cv2 dependency (cv2 optional)."""
    try:
        import cv2
        return cv2.resize(img, (size, size))
    except ImportError:
        h, w = img.shape[:2]
        ys = np.clip((np.arange(size) + 0.5) * h / size - 0.5, 0, h - 1)
        xs = np.clip((np.arange(size) + 0.5) * w / size - 0.5, 0, w - 1)
        y0, x0 = ys.astype(int), xs.astype(int)
        y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
        fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
        if img.ndim == 2:
            img = img[..., None]
        fy, fx = fy[..., None], fx[..., None]
        out = (img[y0][:, x0] * (1 - fy) * (1 - fx)
               + img[y0][:, x1] * (1 - fy) * fx
               + img[y1][:, x0] * fy * (1 - fx)
               + img[y1][:, x1] * fy * fx)
        return out


class FrameStack(Wrapper):
    """Per-agent deque of the last k observations (environment.py:128-156):
    ``reset`` fills all slots with copies; output stacks over a new leading
    per-agent axis -> per-agent shape (k, C, H, W)."""

    def __init__(self, env, stack_frames: int = 1):
        super().__init__(env)
        self.k = stack_frames
        self._q: List[collections.deque] = []

    def _out(self):
        return np.stack([np.stack(list(q)) for q in self._q])

    def reset(self):
        obs = self.env.reset()
        self._q = [collections.deque([np.asarray(o)] * self.k, maxlen=self.k)
                   for o in obs]
        return self._out()

    def step(self, action):
        obs, r, d, info = self.env.step(action)
        for q, o in zip(self._q, obs):
            q.append(np.asarray(o))
        if isinstance(d, (list, tuple)):
            d = all(d)  # list-done collapse (environment.py:151-153)
        return self._out(), r, d, info


class ListSpace(Wrapper):
    """Wrap a single-agent env into the list-of-agents convention
    (environment.py:159-175): obs/reward become length-1 leading axes and
    actions are unwrapped from a 1-list."""

    def reset(self):
        return np.asarray(self.env.reset())[None]

    def step(self, action):
        obs, r, d, info = self.env.step(action[0])
        return np.asarray(obs)[None], np.asarray([r], np.float32), d, info


def make_external_env(env_id: str):
    """Lazy import boundary for non-Track2D env families (the reference's
    ``gym_unrealcv`` UE4 3D envs, environment.py:8-9,15). Imports happen
    only when such an id is requested, so Track2D-only installs never need
    the external packages."""
    import importlib
    if "Unreal" in env_id or "General" in env_id:
        try:
            importlib.import_module("gym_unrealcv")
        except ImportError as e:
            raise ImportError(
                f"env id {env_id!r} needs the external 'gym_unrealcv' "
                "package (UE4 binaries); install it separately — it is "
                "intentionally not a dependency of this framework.") from e
        import gym
        return gym.make(env_id)
    raise ValueError(f"unknown external env family for id {env_id!r}")


def create_env(env_id: str, rescale: bool = False, inv: bool = False,
               single: bool = False, stack_frames: int = 1,
               input_size: int = 80, gray: bool = False, seed: int = 0):
    """The reference's factory + wrapper chain (environment.py:11-32):
    ``listspace`` if single -> ``Rescale`` if rescale -> image preprocess for
    non-2D image envs -> ``frame_stack`` always."""
    if "Track2D" in env_id:
        env: Any = GymTrackEnv(env_id, seed=seed)
        is_2d = True
    else:
        env = make_external_env(env_id)
        is_2d = False
    if single:
        env = ListSpace(env)
    if rescale:
        env = Rescale(env, inv=inv)
    if not is_2d:
        env = ImagePreprocess(env, input_size=input_size, gray=gray)
    return FrameStack(env, stack_frames)


class HostEnvPool:
    """Batch N host gym envs behind the learner's (B, ...) array interface.

    This is the adapter that lets the external 3D family (or any host gym
    env) train against the TPU learner: the model forward stays a batched
    on-device call; env stepping runs on host CPU here. For Track2D use the
    on-device vectorized path instead (orders of magnitude faster)."""

    def __init__(self, env_fns: Sequence[Any]):
        self.envs = [fn() for fn in env_fns]

    def reset(self) -> np.ndarray:
        return np.stack([e.reset() for e in self.envs])

    def step(self, actions: np.ndarray
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, list]:
        obs, rews, dones, infos = [], [], [], []
        for e, a in zip(self.envs, actions):
            o, r, d, i = e.step(a)
            if d:
                o = e.reset()
            obs.append(o)
            rews.append(r)
            dones.append(d)
            infos.append(i)
        return (np.stack(obs), np.stack(rews),
                np.asarray(dones, bool), infos)

    def __len__(self):
        return len(self.envs)
