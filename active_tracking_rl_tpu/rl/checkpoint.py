"""Checkpoint / resume.

Reference semantics (test.py:111-127, main.py:81-85, gym_eval.py:74-92):
  * best vs latest selection on tracker mean eval reward >= running max
    ("all-best-{iter}.dat" / "*-new.dat");
  * optional split player0/player1 files (--split);
  * warm-start from a full checkpoint; eval-side tracker-only / target-only
    loading.

Improvements over the reference (SURVEY.md §5.4): the reference saves
weights only — optimizer state, step counter and PRNG are lost on resume.
Here the full training state (params + opt_state + step + env carry
[EnvState, frame stacks, RNN state, PRNG key] + curriculum phase +
best-score watermark) is serialized, so preemption resume is bit-exact
(tests/test_resume.py proves train->save->resume == uninterrupted).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


#: train_state.msgpack format version (bump on layout changes).
TRAIN_STATE_VERSION = 1


def save_train_state(log_dir: str, train_state: Dict[str, Any]) -> None:
    """Serialize the full training state with flax (msgpack), not pickle:
    version-stable across python/library upgrades, same codec as the params
    files. Structure (namedtuples, optax states) is flattened with
    `to_state_dict`; `load_train_state` restores it against a template."""
    blob = serialization.to_state_dict(_to_host(train_state))
    payload = serialization.msgpack_serialize(
        {"version": TRAIN_STATE_VERSION, "state": blob})
    with open(os.path.join(log_dir, "train_state.msgpack"), "wb") as f:
        f.write(payload)


def load_train_state(log_dir: str,
                     template: Optional[Dict[str, Any]] = None
                     ) -> Dict[str, Any]:
    """Load a train_state dir. `template` maps keys ("params", "opt_state",
    "carry") to pytrees of the expected structure; matching entries are
    restored into that structure via `from_state_dict`. Without a template,
    new-format array trees come back as plain nested state dicts.

    Falls back to the legacy pickle format (rounds <= 3) when only
    train_state.pkl exists — those already hold real pytrees, so the
    template is unnecessary there."""
    p = os.path.join(log_dir, "train_state.msgpack")
    if os.path.exists(p):
        with open(p, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        version = payload.get("version")
        if version != TRAIN_STATE_VERSION:
            raise ValueError(
                f"unsupported train_state version {version!r} in {p} "
                f"(expected {TRAIN_STATE_VERSION})")
        raw = payload["state"]
        if template is not None:
            raw = dict(raw)
            for k, tmpl in template.items():
                if k in raw:
                    raw[k] = serialization.from_state_dict(tmpl, raw[k])
        return raw
    legacy = os.path.join(log_dir, "train_state.pkl")
    with open(legacy, "rb") as f:
        return pickle.load(f)


def save_file(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_to_host(tree)))


def load_file(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


class CheckpointManager:
    """best/latest + split tracker/target checkpoints in a log dir."""

    def __init__(self, log_dir: str, split: bool = True):
        self.log_dir = log_dir
        self.split = split
        self.max_score = -100.0  # test.py:50
        os.makedirs(log_dir, exist_ok=True)

    def save(self, params, train_state: Optional[Dict[str, Any]],
             score: float, n_iter: int) -> bool:
        """Returns True if this was a new best (test.py:112-121)."""
        best = score >= self.max_score
        if best:
            self.max_score = score
            tag = "best"
            save_file(os.path.join(self.log_dir, f"all-best-{n_iter}.msgpack"),
                      params)
        else:
            tag = "new"
        save_file(os.path.join(self.log_dir, f"all-{tag}.msgpack"), params)
        if self.split:
            save_file(os.path.join(self.log_dir, f"tracker-{tag}.msgpack"),
                      params["player0"])
            if "player1" in params:
                save_file(os.path.join(self.log_dir, f"target-{tag}.msgpack"),
                          params["player1"])
        if train_state is not None:
            # Inject the POST-update best-score watermark so resume restores
            # the exact "is this a new best" state the run would have had.
            save_train_state(self.log_dir,
                             dict(train_state, max_score=self.max_score))
        with open(os.path.join(self.log_dir, "ckpt_meta.json"), "w") as f:
            json.dump({"max_score": self.max_score, "n_iter": n_iter}, f)
        return best

    def load_meta(self) -> Optional[Dict[str, Any]]:
        p = os.path.join(self.log_dir, "ckpt_meta.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
        return None


def load_params(params_template, load_model: Optional[str] = None,
                load_tracker: Optional[str] = None,
                load_target: Optional[str] = None):
    """gym_eval.py:74-92: full / tracker-only / target-only loading."""
    params = params_template
    if load_model:
        params = load_file(load_model, params)
    if load_tracker:
        params = dict(params)
        params["player0"] = load_file(load_tracker, params["player0"])
    if load_target:
        params = dict(params)
        params["player1"] = load_file(load_target, params["player1"])
    return params


