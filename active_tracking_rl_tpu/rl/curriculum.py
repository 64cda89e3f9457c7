"""Curriculum / train-mode scheduling (the evaluator's controller role,
test.py:80-92).

Reference semantics reproduced:
  * while total iterations < init_step: mode 0 (tracker-only warmup);
  * train_mode in {0, 1, -1}: pinned to that mode after warmup;
  * train_mode == 2: alternate — the reference's alternation is
    spec'd-but-broken (it reads the undefined `args.adv_step`, test.py:90,
    and re-pins the mode to 2 between switches). Implemented properly here:
    after warmup, alternate target-phase (mode 1, `adv_step` iters) and
    tracker-phase (mode 0, `init_step` iters), starting with the target.
    Timing note: `last_switch` tracks the warmup's end, so the first
    tracker phase effectively runs 2 x init_step iterations before the
    first flip (observed schedule with init_step 1000 / adv_step 500:
    mode 1 at iter 2000, 0 at 2550, 1 at 3550, ... — runs/r4-mode2).

Pure host-side function of replicated scalars: every host computes the same
mode, so no Manager-list control channel is needed (SURVEY.md §5.8).
"""

from __future__ import annotations

import dataclasses

from active_tracking_rl_tpu.config import TrainConfig


@dataclasses.dataclass
class CurriculumState:
    mode: int
    last_switch: int
    phase_len: int

    @classmethod
    def initial(cls, tcfg: TrainConfig) -> "CurriculumState":
        if tcfg.train_mode == 2:
            return cls(mode=0, last_switch=0, phase_len=max(tcfg.init_step, 0))
        return cls(mode=tcfg.train_mode, last_switch=0, phase_len=0)


def update(tcfg: TrainConfig, st: CurriculumState,
           n_iter: int) -> CurriculumState:
    """Advance the schedule given the global iteration count."""
    if n_iter < tcfg.init_step:
        return dataclasses.replace(st, mode=0, last_switch=n_iter)
    if tcfg.train_mode != 2:
        return dataclasses.replace(st, mode=tcfg.train_mode)
    # alternation
    if n_iter - st.last_switch > st.phase_len:
        new_mode = 1 if st.mode != 1 else 0
        phase = tcfg.init_step if new_mode == 0 else tcfg.adv_step
        return CurriculumState(mode=new_mode, last_switch=n_iter,
                               phase_len=max(phase, 1))
    return st
