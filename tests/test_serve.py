"""HTTP caption server: micro-batched serving over CaptionPipeline."""

import io
import json
import os
import sys
import threading
import urllib.request

import numpy as np
import pytest

# Heavy CLI / engine end-to-end tests (subprocess compiles): the third
# suite chunk on slow rigs — `pytest -m e2e` (README Testing section).
pytestmark = pytest.mark.e2e

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_cli import coco_tree  # noqa: F401
from tests.test_pipeline import _tiny_pipeline, tiny_env  # noqa: F401


def _jpeg_bytes(arr: np.ndarray) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


@pytest.fixture()
def server(coco_tree):  # noqa: F811
    from depth_image_captioning_pub_tpu.serve import serve
    pipe = _tiny_pipeline(batch_size=4)
    # generous window: the 1-core CI rig serializes the posting threads'
    # host-side JPEG decodes, which must all land inside one batch window
    httpd = serve(pipe, host="127.0.0.1", port=0, batch_window_ms=250.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd, pipe
    httpd.shutdown()
    httpd.service.stop()


def _post(port: int, payload: bytes) -> dict:
    req = urllib.request.Request(f"http://127.0.0.1:{port}/caption",
                                 data=payload, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


def test_caption_endpoint_and_microbatching(server):
    httpd, pipe = server
    port = httpd.server_address[1]
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (3, 224, 224, 3), dtype=np.uint8)

    # concurrent posts land in one micro-batch (window 250ms, batch cap 4)
    results = [None] * 3
    def worker(i):
        results[i] = _post(port, _jpeg_bytes(imgs[i]))
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all("caption" in r for r in results)

    # server captions == pipeline captions on the SAME decoded bytes
    # (JPEG is lossy, so compare against the round-tripped arrays)
    from PIL import Image
    arrays = [np.asarray(Image.open(io.BytesIO(_jpeg_bytes(im)))
                         .convert("RGB")) for im in imgs]
    expect = pipe(arrays)
    assert [r["caption"] for r in results] == expect

    svc = httpd.service
    assert svc.images_served >= 3
    assert svc.batches_run <= 2  # micro-batching actually batched

    # health endpoint
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["images_served"] >= 3

    # metrics endpoint: rolling-window latency/device percentiles,
    # batch histogram consistent with the counters
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
        m = json.loads(r.read())
    assert m["images_served"] == svc.images_served
    assert sum(m["batch_size_hist"].values()) == m["batches_run"]
    assert sum(int(k) * v for k, v in m["batch_size_hist"].items()) \
        == m["images_served"]
    lat = m["request_latency"]
    assert lat["n"] >= 3 and 0 < lat["p50_ms"] <= lat["p99_ms"]
    dev = m["device_batch"]
    assert dev["n"] == m["batches_run"] and dev["p50_ms"] > 0
    assert m["queue_depth"] == 0


def test_main_threads_sampling_flags(monkeypatch):
    """`dcap-serve --sample --temperature … --top-k … --top-p … --seed …`
    reaches CaptionPipeline.from_experiment verbatim (the flag-threading
    layer, per the CLI-coverage rule; no model is built)."""
    import depth_image_captioning_pub_tpu.serve as serve_mod

    seen = {}

    def fake_from_experiment(kind, use_data, **kw):
        seen.update(kind=kind, use_data=use_data, **kw)
        return object()

    class FakeHTTPD:
        def serve_forever(self):
            raise KeyboardInterrupt  # exit main() immediately
        service = type("S", (), {"stop": staticmethod(lambda: None)})()

        def server_close(self):
            pass

    # main() imports CaptionPipeline from the pipeline module at call time
    monkeypatch.setattr(
        "depth_image_captioning_pub_tpu.pipeline.CaptionPipeline."
        "from_experiment", staticmethod(fake_from_experiment))
    monkeypatch.setattr(serve_mod, "serve", lambda *a, **k: FakeHTTPD())
    rc = serve_mod.main(["--kind", "base-soft", "--sample",
                         "--temperature", "1.5", "--top-k", "7",
                         "--top-p", "0.9", "--seed", "11",
                         "--batch-buckets", "1,4", "--devices", "2"])
    assert rc == 0
    assert seen["sample"] is True and seen["temperature"] == 1.5
    assert seen["top_k"] == 7 and seen["top_p"] == 0.9 and seen["seed"] == 11
    assert seen["batch_buckets"] == [1, 4]
    import jax
    assert seen["devices"] == jax.devices()[:2]
    # default: no cfg override built when --gelu is erf
    assert seen["cfg"] is None


def test_main_export_dir(monkeypatch):
    """`dcap-serve --export-dir art/` serves an ExportedPipeline.load
    artifact instead of exp_result/ checkpoints."""
    import depth_image_captioning_pub_tpu.serve as serve_mod

    seen = {}

    class FakeHTTPD:
        def serve_forever(self):
            raise KeyboardInterrupt
        service = type("S", (), {"stop": staticmethod(lambda: None)})()

        def server_close(self):
            pass

    def fake_load(export_dir, seed=0):
        seen.update(export_dir=export_dir, seed=seed)
        return object()

    monkeypatch.setattr(
        "depth_image_captioning_pub_tpu.export.ExportedPipeline.load",
        staticmethod(fake_load))
    monkeypatch.setattr(serve_mod, "serve", lambda *a, **k: FakeHTTPD())
    rc = serve_mod.main(["--export-dir", "art", "--seed", "5"])
    assert rc == 0
    assert seen == {"export_dir": "art", "seed": 5}


def test_main_threads_gelu_flag(monkeypatch):
    """`dcap-serve --gelu tanh` builds a cfg with dpt_gelu='tanh' for
    from_experiment (make_depth_fn applies the knob from cfg)."""
    import depth_image_captioning_pub_tpu.serve as serve_mod

    seen = {}

    def fake_from_experiment(kind, use_data, **kw):
        seen.update(kind=kind, **kw)
        return object()

    class FakeHTTPD:
        def serve_forever(self):
            raise KeyboardInterrupt
        service = type("S", (), {"stop": staticmethod(lambda: None)})()

        def server_close(self):
            pass

    monkeypatch.setattr(
        "depth_image_captioning_pub_tpu.pipeline.CaptionPipeline."
        "from_experiment", staticmethod(fake_from_experiment))
    monkeypatch.setattr(serve_mod, "serve", lambda *a, **k: FakeHTTPD())
    rc = serve_mod.main(["--kind", "depth-soft", "--gelu", "tanh"])
    assert rc == 0
    assert seen["cfg"] is not None and seen["cfg"].dpt_gelu == "tanh"


def test_oversized_post_rejected_413(server, monkeypatch):
    """A POST whose Content-Length exceeds MAX_REQUEST_BYTES is refused
    BEFORE the body is read (memory-exhaustion guard)."""
    import urllib.error
    import depth_image_captioning_pub_tpu.serve as serve_mod
    httpd, _ = server
    port = httpd.server_address[1]
    monkeypatch.setattr(serve_mod, "MAX_REQUEST_BYTES", 1024)
    try:
        _post(port, b"x" * 4096)
        raise AssertionError("oversized POST was accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 413
        assert "exceeds limit" in json.loads(e.read())["error"]
    # normal-sized requests still work once the limit is back
    monkeypatch.setattr(serve_mod, "MAX_REQUEST_BYTES", 32 * 1024 * 1024)
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    assert "caption" in _post(port, _jpeg_bytes(img))


def test_stop_drains_in_flight_jobs():
    """CaptionService.stop(): jobs already queued are captioned before the
    worker exits, even when the shutdown sentinel lands in their batch."""
    import time
    from depth_image_captioning_pub_tpu.serve import CaptionService, _Job

    class StubPipeline:
        batch_size = 8
        image_hw = (4, 4)
        id_to_word = {0: "ok", 1: "<end>"}

        def caption_tokens(self, arrays):
            time.sleep(0.05)  # let the sentinel join the batch
            return np.zeros((arrays.shape[0], 3), np.int32)

    svc = CaptionService(StubPipeline(), batch_window_ms=100.0)
    jobs = [_Job(np.zeros((4, 4, 3), np.uint8)) for _ in range(3)]
    for j in jobs:
        svc.queue.put(j)
    svc.stop()                      # sentinel enqueued behind the jobs
    for j in jobs:
        assert j.event.wait(5.0)
        assert j.error is None and j.caption is not None
    svc.worker.join(timeout=5.0)
    assert not svc.worker.is_alive()  # sentinel survived the mixed batch


def test_stop_drains_backlog_beyond_one_batch():
    """SIGTERM under load: jobs queued past the batch cap at stop() time
    are still captioned (regression: the worker loop used to gate on the
    stop flag and exit after the first post-stop batch, stranding the
    rest until their submit timeout)."""
    import time
    from depth_image_captioning_pub_tpu.serve import CaptionService, _Job

    class StubPipeline:
        batch_size = 4
        image_hw = (4, 4)
        id_to_word = {0: "ok", 1: "<end>"}

        def caption_tokens(self, arrays):
            time.sleep(0.02)
            return np.zeros((arrays.shape[0], 3), np.int32)

    svc = CaptionService(StubPipeline(), batch_window_ms=5.0)
    jobs = [_Job(np.zeros((4, 4, 3), np.uint8)) for _ in range(11)]
    for j in jobs:
        svc.queue.put(j)            # 11 jobs = 3 batches at cap 4
    svc.stop()
    for j in jobs:
        assert j.event.wait(5.0)
        assert j.error is None and j.caption is not None
    svc.worker.join(timeout=5.0)
    assert not svc.worker.is_alive()


def test_reload_timeout_cancels_queued_job():
    """A reload that times out while still QUEUED is cancelled: the worker
    skips it (no late surprise swap, ADVICE r4) and the error says no swap
    will occur."""
    import time
    from depth_image_captioning_pub_tpu.serve import CaptionService, _Job

    class StubPipeline:
        batch_size = 4
        image_hw = (4, 4)
        id_to_word = {0: "ok", 1: "<end>"}
        reload_calls = 0

        def caption_tokens(self, arrays):
            time.sleep(0.6)           # keep the worker busy past the timeout
            return np.zeros((arrays.shape[0], 3), np.int32)

        def reload_from_experiment(self):
            StubPipeline.reload_calls += 1

    svc = CaptionService(StubPipeline(), batch_window_ms=5.0)
    j = _Job(np.zeros((4, 4, 3), np.uint8))
    svc.queue.put(j)                  # occupies the worker for ~0.6s
    time.sleep(0.15)                  # let the worker start the batch
    with pytest.raises(TimeoutError, match="no weight swap"):
        svc.reload(timeout=0.05)      # queued behind the busy batch
    assert j.event.wait(5.0)
    time.sleep(0.3)                   # worker drains the cancelled job
    assert svc.reloads_done == 0
    assert StubPipeline.reload_calls == 0
    svc.stop()


def test_reload_timeout_midswap_says_so():
    """A reload that times out while RUNNING cannot be cancelled — the
    error must say the swap may still land, and it does land."""
    import time
    from depth_image_captioning_pub_tpu.serve import CaptionService

    class StubPipeline:
        batch_size = 4
        image_hw = (4, 4)
        id_to_word = {0: "ok", 1: "<end>"}

        def caption_tokens(self, arrays):
            return np.zeros((arrays.shape[0], 3), np.int32)

        def reload_from_experiment(self):
            time.sleep(0.4)           # slower than the caller's timeout

    svc = CaptionService(StubPipeline(), batch_window_ms=5.0)
    with pytest.raises(TimeoutError, match="may still land"):
        svc.reload(timeout=0.05)      # claimed immediately (idle worker)
    deadline = time.monotonic() + 5.0
    while svc.reloads_done == 0 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert svc.reloads_done == 1      # the in-flight swap completed
    svc.stop()


def test_reload_with_body_keeps_keepalive_in_sync(server):
    """POST /reload with a non-empty body on a keep-alive connection: the
    handler must drain the body before replying (ADVICE r4), or the next
    request on the same socket desyncs."""
    import http.client
    httpd, _ = server
    port = httpd.server_address[1]
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    try:
        conn.request("POST", "/reload", body=b"x" * 4096,
                     headers={"Content-Type": "application/octet-stream"})
        r1 = conn.getresponse()
        body1 = r1.read()
        # tiny pipeline has no experiment dir -> refusal (500) is fine;
        # what matters is the reply parses and the socket stays in sync
        assert r1.status in (200, 500)
        json.loads(body1)
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["ok"] is True
    finally:
        conn.close()


def test_bad_requests(server):
    httpd, _ = server
    port = httpd.server_address[1]
    req = urllib.request.Request(f"http://127.0.0.1:{port}/caption",
                                 data=b"not an image", method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
    assert e2.value.code == 404


def test_run_forever_drain_order():
    """Shutdown joins in-flight handler threads (server_close) BEFORE
    stopping the caption worker — the reverse would strand handlers whose
    jobs the dead worker never captions."""
    from depth_image_captioning_pub_tpu.serve import _run_forever

    order = []

    class StubService:
        def stop(self):
            order.append("stop")

    class StubHTTPD:
        service = StubService()

        def serve_forever(self):
            order.append("serve")
            raise KeyboardInterrupt

        def server_close(self):
            order.append("close")

    assert _run_forever(StubHTTPD()) == 0
    assert order == ["serve", "close", "stop"]


def test_submit_after_stop_refused():
    """submit() after stop() raises instead of queuing a job behind the
    shutdown sentinel (which would hold the worker past its drain)."""
    import pytest as _pytest
    from depth_image_captioning_pub_tpu.serve import CaptionService

    class StubPipeline:
        batch_size = 2
        image_hw = (4, 4)
        id_to_word = {0: "ok", 1: "<end>"}

        def caption_tokens(self, arrays):
            return np.zeros((arrays.shape[0], 3), np.int32)

    svc = CaptionService(StubPipeline(), batch_window_ms=1.0)
    svc.stop()
    with _pytest.raises(RuntimeError, match="shutting down"):
        svc.submit(np.zeros((4, 4, 3), np.uint8))


def test_main_threads_dpt_head_flag(monkeypatch):
    """`dcap-serve --dpt-head lowres` builds a cfg with dpt_head set (same
    flag-threading layer as --gelu)."""
    import depth_image_captioning_pub_tpu.serve as serve_mod

    seen = {}

    def fake_from_experiment(kind, use_data, **kw):
        seen.update(kind=kind, use_data=use_data, **kw)
        return object()

    class FakeHTTPD:
        def serve_forever(self):
            raise KeyboardInterrupt
        service = type("S", (), {"stop": staticmethod(lambda: None)})()

        def server_close(self):
            pass

    monkeypatch.setattr(
        "depth_image_captioning_pub_tpu.pipeline.CaptionPipeline."
        "from_experiment", staticmethod(fake_from_experiment))
    monkeypatch.setattr(serve_mod, "serve", lambda *a, **k: FakeHTTPD())
    rc = serve_mod.main(["--kind", "depth-soft", "--dpt-head", "lowres"])
    assert rc == 0
    assert seen["cfg"].dpt_head == "lowres"
    assert seen["cfg"].dpt_gelu == "erf"


def test_reload_endpoint(server, monkeypatch):
    """POST /reload: 500 with the error when the pipeline can't reload
    (not built by from_experiment), 200 + counter once it can; the swap
    runs on the worker thread between batches and serving continues."""
    httpd, pipe = server
    port = httpd.server_address[1]

    def post_reload():
        req = urllib.request.Request(f"http://127.0.0.1:{port}/reload",
                                     data=b"", method="POST")
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    code, body = post_reload()           # _tiny_pipeline: not an experiment
    assert code == 500 and "from_experiment" in body["error"]

    calls = []
    monkeypatch.setattr(pipe, "reload_from_experiment",
                        lambda: calls.append(1))
    code, body = post_reload()
    assert code == 200 and body["reloaded"] is True
    assert body["reloads_done"] == 1 and calls == [1]

    # serving still works after the swap, and metrics carry the counter
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    assert "caption" in _post(port, _jpeg_bytes(img))
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=10) as r:
        assert json.loads(r.read())["reloads_done"] == 1
