"""gym registry stand-in: register(id, entry_point, kwargs,
max_episode_steps) + make(id) -> TimeLimit(env) — the exact surface used by
reference gym_track2d/__init__.py:3-18."""

import importlib

from gym.core import TimeLimit

registry = {}


class EnvSpec:
    def __init__(self, id, entry_point, kwargs=None, max_episode_steps=None):
        self.id = id
        self.entry_point = entry_point
        self.kwargs = kwargs or {}
        self.max_episode_steps = max_episode_steps

    def make(self):
        if callable(self.entry_point):
            cls = self.entry_point
        else:
            mod_name, _, attr = self.entry_point.partition(":")
            cls = getattr(importlib.import_module(mod_name), attr)
        env = cls(**self.kwargs)
        if self.max_episode_steps is not None:
            env = TimeLimit(env, self.max_episode_steps)
        return env


def register(id, entry_point, kwargs=None, max_episode_steps=None, **extra):
    registry[id] = EnvSpec(id, entry_point, kwargs, max_episode_steps)


def make(id, **kwargs):
    if id not in registry:
        raise KeyError(f"env id not registered: {id}")
    return registry[id].make()
