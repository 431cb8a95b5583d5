"""bench.py driver-budget survival (VERDICT r3 item 1): BENCH_r03 was
rc=124/parsed=null because the single end-of-run JSON print sat behind all
eight segments and an uncapped chip wait. These pin the new contract:
incremental flushed emission, budget-capped chip wait, segment skipping,
and partial-JSON emission on SIGTERM / watchdog overrun."""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture()
def bench(monkeypatch):
    import bench as b
    # fresh budget window + empty result per test
    monkeypatch.setattr(b, "T0", time.monotonic())
    monkeypatch.setattr(b, "BUDGET_S", 3000.0)
    monkeypatch.setattr(b, "RESULT", {})
    return b


class FakeClock:
    """Stand-in for bench's ``time`` module: sleep() advances monotonic()
    instantly so wait loops resolve without wall-clock cost."""

    def __init__(self):
        self.now = 1000.0
        self.sleeps = []

    def monotonic(self):
        return self.now

    def sleep(self, s):
        self.sleeps.append(s)
        self.now += s

    def perf_counter(self):
        return self.now


def test_wait_for_chip_respects_budget(bench, monkeypatch):
    clock = FakeClock()
    monkeypatch.setattr(bench, "time", clock)
    monkeypatch.setattr(bench.os, "environ", dict(os.environ,
                                                  JAX_PLATFORMS="tpu"))
    calls = []

    def always_timeout(*a, **k):
        calls.append(k.get("timeout"))
        clock.now += k.get("timeout", 0)
        raise subprocess.TimeoutExpired(cmd="x", timeout=k.get("timeout"))

    import subprocess as sp
    monkeypatch.setattr(sp, "run", always_timeout)
    t_start = clock.now
    bench.wait_for_chip(wait_budget=600, probe_timeout=240, backoff=240)
    # never waits past the budget: 240 probe + 240 backoff + 240 probe,
    # then left <= backoff -> bail out
    assert clock.now - t_start <= 600 + 240
    assert len(calls) <= 3


def test_wait_for_chip_caps_settle_sleep(bench, monkeypatch):
    clock = FakeClock()
    monkeypatch.setattr(bench, "time", clock)
    monkeypatch.setattr(bench.os, "environ", dict(os.environ,
                                                  JAX_PLATFORMS="tpu"))

    class OK:
        returncode = 0

    import subprocess as sp
    monkeypatch.setattr(sp, "run", lambda *a, **k: OK())
    bench.wait_for_chip(wait_budget=90)
    # the 210 s claim-settle sleep is capped at the remaining budget
    assert clock.sleeps and clock.sleeps[-1] <= 90


def test_run_segment_skips_when_budget_spent(bench, monkeypatch, capsys):
    monkeypatch.setattr(bench, "BUDGET_S", 100.0)
    monkeypatch.setattr(bench, "T0", time.monotonic() - 99.0)  # ~1 s left
    ran = []
    bench.run_segment("tail", est_s=300, fn=lambda: ran.append(1))
    assert not ran
    assert "skipping tail" in capsys.readouterr().err


def test_run_segment_emits_even_on_failure(bench, capsys):
    bench.RESULT["value"] = 1.0

    def boom():
        raise RuntimeError("segment exploded")

    bench.run_segment("tail", est_s=0, fn=boom)
    out = capsys.readouterr()
    assert "segment exploded" in out.err
    assert json.loads(out.out.strip().splitlines()[-1])["value"] == 1.0


def test_emit_is_parseable_and_incremental(bench, capsys):
    bench.RESULT.update({"metric": "m", "value": None})
    bench.emit()
    bench.RESULT["value"] = 42.0
    bench.emit()
    lines = capsys.readouterr().out.strip().splitlines()
    assert json.loads(lines[0])["value"] is None
    assert json.loads(lines[-1])["value"] == 42.0  # driver parses the last


def test_flops_per_call_and_mfu(bench):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x, w: x @ w)
    x = jnp.ones((8, 16), jnp.float32)
    w = jnp.ones((16, 32), jnp.float32)
    fl = bench.flops_per_call(f, x, w)
    assert fl == pytest.approx(2 * 8 * 16 * 32, rel=0.01)
    # 1 call/s at batch 8 -> fl/8 flops/s over peak (shrunk so the
    # 4-decimal rounding of real-workload MFUs doesn't flatten the toy)
    monkeypatch = pytest.MonkeyPatch()
    monkeypatch.setattr(bench, "PEAK_TFLOPS", 1e-6)
    try:
        assert bench.mfu(8.0, 8, fl) == pytest.approx(fl / 1e6, abs=1e-4)
    finally:
        monkeypatch.undo()
    assert bench.mfu(None, 8, fl) is None
    assert bench.mfu(8.0, 8, None) is None


WATCHDOG_DRIVER = textwrap.dedent("""
    import os, sys, time
    sys.path.insert(0, {repo!r})
    import bench
    bench.RESULT.update({{"metric": "partial", "value": 7.0}})
    bench._arm_watchdog()
    print("armed", flush=True)
    time.sleep(60)
""")


def _last_json(stdout: bytes):
    for line in reversed(stdout.decode().strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return None


def test_sigterm_emits_partial_json(tmp_path):
    """The driver's ``timeout`` sends SIGTERM before SIGKILL: the handler
    must flush a parseable partial-result line and exit 2."""
    p = subprocess.Popen([sys.executable, "-c",
                          WATCHDOG_DRIVER.format(repo=REPO)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=dict(os.environ, BENCH_WATCHDOG_S="3600",
                                  JAX_PLATFORMS="cpu"))
    # wait until the handler is installed before signalling
    assert p.stdout.readline().strip() == b"armed"
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=30)
    assert p.returncode == 2
    assert _last_json(b"armed\n" + out) == {"metric": "partial",
                                            "value": 7.0}


def test_watchdog_thread_emits_on_overrun():
    """The overrun watchdog is a THREAD (a SIGALRM handler can't run while
    the main thread is stuck in a hung C device call): it must emit the
    partial JSON and exit 2 even though the main thread never returns."""
    p = subprocess.Popen([sys.executable, "-c",
                          WATCHDOG_DRIVER.format(repo=REPO)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=dict(os.environ, BENCH_WATCHDOG_S="1",
                                  JAX_PLATFORMS="cpu"))
    out, err = p.communicate(timeout=30)
    assert p.returncode == 2
    assert b"watchdog" in err
    assert _last_json(out) == {"metric": "partial", "value": 7.0}


def test_main_emits_full_key_contract(bench, monkeypatch, capsys):
    """Round-5 artifact contract: with every measurement stubbed, main()'s
    LAST JSON line must carry the full key set — headline + raw baseline
    denominator + e2e_vs_baseline (the literal north-star ratio) + the
    hard/NIC matrix keys + the disciplined serve keys (VERDICT r4 items
    1/2/4)."""
    monkeypatch.setenv("BENCH_WATCHDOG_S", "-1")   # no overrun ticker
    monkeypatch.setattr(bench, "wait_for_chip", lambda *a, **k: None)
    monkeypatch.setattr(bench, "bench_torch_cpu", lambda *a, **k: 2.0)
    monkeypatch.setattr(bench, "bench_tpu",
                        lambda: (4000.0, 11000.0, 16000.0, 0.43))
    monkeypatch.setattr(bench, "bench_depth_tpu",
                        lambda: (300.0, 3900.0, 317.0, 343.0, 0.44))
    monkeypatch.setattr(bench, "bench_variants_tpu",
                        lambda: {"hard": 3000.0, "nic": 8000.0})
    monkeypatch.setattr(bench, "bench_beam_tpu", lambda: 2900.0)
    monkeypatch.setattr(bench, "bench_train_tpu", lambda *a, **k: 2900.0)
    monkeypatch.setattr(bench, "bench_e2e_tpu", lambda: (110.0, 255.0))
    monkeypatch.setattr(bench, "bench_serve_tpu",
                        lambda: {"p50_ms": 50.0, "caps_per_sec": 66.0,
                                 "effective_batch": 12.4,
                                 "windows": [60.1, 66.0]})
    bench.main()
    last = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for k in ("value", "unit", "vs_baseline", "baseline_captions_per_sec",
              "cached_captions_per_sec", "cached_pallas_captions_per_sec",
              "mfu_greedy", "depth_soft_captions_per_sec", "mfu_depth",
              "hard_captions_per_sec", "nic_captions_per_sec",
              "beam5_captions_per_sec", "train_images_per_sec", "mfu_train",
              "depth_train_images_per_sec",
              "train_feature_cache_images_per_sec", "e2e_captions_per_sec",
              "e2e_vs_baseline", "serve_latency_p50_ms", "serve_caps_per_sec",
              "serve_effective_batch", "serve_window_rates"):
        assert k in last, k
    assert last["baseline_captions_per_sec"] == 2.0
    assert last["vs_baseline"] == pytest.approx(2000.0)
    assert last["e2e_vs_baseline"] == pytest.approx(55.0)
    assert last["hard_captions_per_sec"] == 3000.0
    assert last["nic_captions_per_sec"] == 8000.0
    assert last["serve_window_rates"] == [60.1, 66.0]
