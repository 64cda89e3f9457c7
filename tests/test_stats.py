"""utils/stats.py — Wilson interval sanity (the eval matrix's error bars)."""

from active_tracking_rl_tpu.utils.stats import wilson_ci


def test_wilson_known_values():
    # 94/100: classic textbook-ish check
    lo, hi = wilson_ci(94, 100)
    assert 0.87 < lo < 0.90 and 0.96 < hi < 0.98
    # symmetric around 0.5
    lo, hi = wilson_ci(50, 100)
    assert abs((0.5 - lo) - (hi - 0.5)) < 1e-9


def test_wilson_edge_cases():
    assert wilson_ci(0, 0) == [0.0, 1.0]
    lo, hi = wilson_ci(300, 300)     # S_rate 1.00 on 300 episodes
    assert hi == 1.0 and 0.98 < lo < 0.995
    lo, hi = wilson_ci(0, 300)
    assert lo == 0.0 and 0.0 < hi < 0.02


def test_wilson_monotone_in_n():
    w100 = wilson_ci(80, 100)
    w1000 = wilson_ci(800, 1000)
    assert (w1000[1] - w1000[0]) < (w100[1] - w100[0])  # tighter with more n
