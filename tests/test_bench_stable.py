"""bench.stable_rate: best-of-windows logic that guards the driver's
end-of-round numbers against rig co-tenancy dips (STATUS r3d: base-soft
measured 381 caps/s in a full bench vs 3879 solo minutes later)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stable_rate(*a, **k):
    from bench import stable_rate
    return stable_rate(*a, **k)


def test_clean_run_two_windows_best():
    calls = []

    def run():
        calls.append(1)
        return [100.0, 98.0][len(calls) - 1]

    assert _stable_rate(run, "t", cooldown=0) == 100.0
    assert len(calls) == 2  # tight spread: no retries


def test_disturbed_run_retries_until_stable():
    vals = iter([10.0, 100.0, 99.0, 98.0])
    calls = []

    def run():
        calls.append(1)
        return next(vals)

    # first window 10 vs 100 -> spread 0.9 -> retry; after the 3rd the
    # spread over all windows still exceeds 0.3, so it samples to the cap
    assert _stable_rate(run, "t", cooldown=0) == 100.0
    assert len(calls) == 4  # max_reps


def test_reports_best_of_window():
    assert _stable_rate(iter([50.0, 120.0, 118.0, 119.0]).__next__,
                        "t", cooldown=0) == 120.0
