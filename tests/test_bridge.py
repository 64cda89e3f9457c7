"""Host gym bridge, wrappers, rendering, and golden-trace parity."""

import numpy as np
import pytest

from active_tracking_rl_tpu.envs.bridge import (FrameStack, GymTrackEnv,
                                                ImagePreprocess, ListSpace,
                                                Rescale, create_env)
from active_tracking_rl_tpu.envs.render import to_ansi, to_rgb


def test_gym_adapter_api_and_shapes():
    env = GymTrackEnv("Track2D-BlockPartialRam-v0", seed=3)
    obs = env.reset()
    assert obs.shape == (2, 1, 13, 13)  # (agents, C, H, W), track_1v1.py:326
    obs, rew, done, info = env.step([0, 1])
    assert obs.shape == (2, 1, 13, 13)
    assert rew.shape == (2,)
    assert isinstance(done, bool)
    assert {"distance", "traces", "traces_relative"} <= set(info)
    assert set(np.unique(obs)) <= {0.0, 1.0, 2.0, 4.0}


def test_gym_adapter_seed_determinism():
    """seed() actually works here (unlike the reference — SURVEY.md §2.1)."""
    a = GymTrackEnv("Track2D-BlockPartialNav-v0")
    b = GymTrackEnv("Track2D-BlockPartialNav-v0")
    a.seed(7)
    b.seed(7)
    oa, ob = a.reset(), b.reset()
    np.testing.assert_array_equal(oa, ob)
    for _ in range(5):
        sa = a.step([1, 0])
        sb = b.step([1, 0])
        np.testing.assert_array_equal(sa[0], sb[0])
        np.testing.assert_array_equal(sa[1], sb[1])


def test_gym_adapter_episode_terminates():
    env = GymTrackEnv("Track2D-EmptyPartialRam-v0", seed=0)
    env.reset()
    done, t = False, 0
    while not done and t < 600:
        _, _, done, _ = env.step([np.random.randint(4), 0])
        t += 1
    assert done and t <= 500


class _FakeEnv:
    """Tiny 2-agent env emitting constant images."""

    def __init__(self, value=128.0, shape=(10, 8, 3)):
        self.value, self.shape = value, shape

    def reset(self):
        return [np.full(self.shape, self.value, np.float32) for _ in range(2)]

    def step(self, action):
        return self.reset(), np.zeros(2, np.float32), False, {}


def test_rescale_maps_0_255_to_unit():
    env = Rescale(_FakeEnv(255.0))
    obs = env.reset()
    assert np.allclose(obs, 1.0)
    obs, *_ = env.step([0, 0])
    assert np.allclose(obs, 1.0)
    env0 = Rescale(_FakeEnv(0.0))
    assert np.allclose(env0.reset(), -1.0)


def test_image_preprocess_crop_resize_chw():
    env = ImagePreprocess(_FakeEnv(shape=(100, 60, 3)), input_size=32)
    obs = env.reset()
    assert obs.shape == (2, 3, 32, 32)
    env_g = ImagePreprocess(_FakeEnv(shape=(100, 60, 3)), input_size=32,
                            gray=True)
    assert env_g.reset().shape == (2, 1, 32, 32)


def test_frame_stack_fills_and_shifts():
    env = FrameStack(_FakeEnv(), stack_frames=3)
    obs = env.reset()
    assert obs.shape == (2, 3, 10, 8, 3)
    np.testing.assert_array_equal(obs[:, 0], obs[:, 2])  # reset copies
    obs, *_ = env.step([0, 0])
    assert obs.shape == (2, 3, 10, 8, 3)


def test_listspace_wraps_single_agent():
    class Single:
        def reset(self):
            return np.zeros((4, 4))

        def step(self, a):
            return np.zeros((4, 4)), 1.0, False, {}

    env = ListSpace(Single())
    assert env.reset().shape == (1, 4, 4)
    obs, rew, done, _ = env.step([2])
    assert obs.shape == (1, 4, 4) and rew.shape == (1,)


def test_create_env_chain_track2d():
    env = create_env("Track2D-BlockPartialAdv-v0", stack_frames=2, seed=1)
    obs = env.reset()
    assert obs.shape == (2, 2, 1, 13, 13)  # (agents, stack, C, H, W)
    obs, rew, done, info = env.step([0, 0])
    assert obs.shape == (2, 2, 1, 13, 13)


def test_external_env_requires_package():
    with pytest.raises(ImportError):
        create_env("UnrealTrack-General-v0")


def test_render_modes():
    env = GymTrackEnv("Track2D-BlockPartialAdv-v0", seed=2)
    env.reset()
    env.step([0, 1])
    img = env.render("rgb_array")
    s = env.cfg.maze_size
    assert img.shape == (s, s, 3) and img.dtype == np.uint8
    txt = env.render("ansi")
    assert isinstance(txt, str) and "T" in txt and "X" in txt
    # traces appear after steps (track_1v1.py:189-205 draws trajectories)
    for _ in range(6):
        env.step([np.random.randint(4), np.random.randint(4)])
    grid_txt = env.render("ansi")
    assert isinstance(grid_txt, str)


def test_render_palette_roundtrip():
    grid = np.array([[0, 1], [2, 4]], np.uint8)
    img = to_rgb(grid)
    assert img[0, 0].tolist() == [255, 255, 255]
    assert img[0, 1].tolist() == [40, 40, 40]
    assert to_ansi(grid).split("\n") == ["·█", "TX"]


def test_parity_record_verify_roundtrip(tmp_path):
    from active_tracking_rl_tpu.run.parity import record, verify
    p = str(tmp_path / "golden.npz")
    record("Track2D-EmptyPartialRam-v0", seed=5, out_path=p, episodes=1)
    assert verify(p)
