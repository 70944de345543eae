"""Protocol-stamp helpers in bench.py (shared by scaling_bench.py).

quiet_box is the graded-comparison filter: it must flag runs where
external load could have slowed the measurement, and must NOT flag
idle-box runs whose start-of-run probe was merely cold (governor ramp)
— the probe speeding up over the run is evidence of idleness, not
contention.
"""

from bench import quiet_box


IDLE = [0.3, 0.2, 0.1]


def test_quiet_when_idle_and_probe_stable():
    assert quiet_box(IDLE, 0.25, 0.25) is True
    assert quiet_box(IDLE, 0.25, 0.26) is True  # +4% < 5% threshold


def test_not_quiet_when_probe_slows():
    # external load appearing mid-run slows the closing probe
    assert quiet_box(IDLE, 0.25, 0.30) is False  # +20%


def test_quiet_when_probe_speeds_up():
    # cold start-of-run probe (frequency ramp): faster closing probe
    # must not disqualify — only slowdown indicates contention
    assert quiet_box(IDLE, 0.2637, 0.2227) is True


def test_not_quiet_when_loaded_at_start():
    assert quiet_box([4.57, 2.0, 1.0], 0.25, 0.25) is False
