"""Serving runtime: dynamic-batching engine + HTTP server.

The reference has no serving path (demo.py is a serial batch-1 script);
these tests lock the engine's contract: grouped fixed-shape batches,
per-request pad/crop round-trip equal to the direct forward, correct
results under concurrency and mixed sizes, and the HTTP surface.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from promptir_tpu.models import create_model
from promptir_tpu.serve.engine import InferenceEngine, pad_image_np


@pytest.fixture(scope="module")
def tiny():
    model = create_model(
        "promptir", dim=8, num_blocks=(1, 1, 1, 1),
        num_refinement_blocks=1, decoder=False,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))[
        "params"
    ]

    @jax.jit
    def fn(p, x):
        return model.apply({"params": p}, x)

    return fn, params


def make_img(seed, h=30, w=38):
    return np.random.default_rng(seed).uniform(size=(h, w, 3)).astype(
        np.float32
    )


def direct(fn, params, img, pad_base=8):
    xp = pad_image_np(img, pad_base)[None]
    y = np.clip(np.asarray(fn(params, jnp.asarray(xp))), 0.0, 1.0)
    return y[0, : img.shape[0], : img.shape[1], :]


def test_engine_batches_concurrent_same_shape(tiny):
    fn, params = tiny
    imgs = [make_img(i) for i in range(3)]
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=4, batch_timeout_ms=200.0
    ) as eng:
        outs = eng.restore_many(imgs)
        s = eng.stats()
    for img, out in zip(imgs, outs):
        assert out.shape == img.shape
        np.testing.assert_allclose(out, direct(fn, params, img), atol=2e-5)
    # all three rode one fixed-shape batch (padded to max_batch=4)
    assert s["requests"] == 3 and s["batches"] == 1
    assert s["compiled_shapes"] == 1


def test_engine_mixed_sizes_grouped_by_bucket(tiny):
    fn, params = tiny
    a = make_img(0, 30, 38)   # pads to 32x40
    b = make_img(1, 31, 39)   # pads to 32x40 -> same bucket as a
    c = make_img(2, 30, 30)   # pads to 32x32 -> its own bucket
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=4, batch_timeout_ms=100.0
    ) as eng:
        outs = eng.restore_many([a, b, c])
        s = eng.stats()
    for img, out in zip([a, b, c], outs):
        assert out.shape == img.shape
        np.testing.assert_allclose(out, direct(fn, params, img), atol=2e-5)
    assert s["requests"] == 3 and s["batches"] == 2
    assert s["compiled_shapes"] == 2


def test_engine_tiled_fallback_for_oversized_images(tiny):
    """Images padded beyond tile_threshold_px are served through the
    compiled overlap-blend tiler (one fixed tile program for unbounded
    input resolutions) and must equal a direct tiled_inference call."""
    from promptir_tpu.eval.tiling import tiled_inference

    fn, params = tiny
    small = make_img(0, 30, 38)            # 32x40 = 1280 px -> batched
    big = make_img(1, 40, 48)              # 40x48 = 1920 px -> tiled
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=4, batch_timeout_ms=50.0,
        tile_threshold_px=1500, tile_size=16, tile_overlap=8, tile_chunk=4,
    ) as eng:
        out_small, out_big = eng.restore_many([small, big])
        s = eng.stats()
    np.testing.assert_allclose(
        out_small, direct(fn, params, small), atol=2e-5
    )
    ref_big = np.asarray(
        tiled_inference(
            fn, params, jnp.asarray(big[None]), tile=16, overlap=8,
            chunk=4, bucket=8,
        )
    )[0]
    assert out_big.shape == big.shape
    np.testing.assert_allclose(out_big, ref_big, atol=2e-5)
    assert s["tiled_requests"] == 1 and s["requests"] == 2


def test_engine_surfaces_model_errors(tiny):
    _, params = tiny

    def bad_fn(p, x):
        raise RuntimeError("boom")

    with InferenceEngine(bad_fn, params, max_batch=2) as eng:
        with pytest.raises(RuntimeError, match="boom"):
            eng.restore(make_img(0))
    with pytest.raises(RuntimeError, match="closed"):
        eng.submit(make_img(1))


def _gated_identity():
    """A model_fn the test can hold: blocks on `gate`, sets `started`
    when the device thread enters it. Returns (fn, started, gate)."""
    started = threading.Event()
    gate = threading.Event()

    def fn(p, x):
        started.set()
        gate.wait(timeout=30)
        return x

    return fn, started, gate


def test_engine_rejects_when_overloaded(tiny):
    """Bounded in-flight queue: submits past max_queue shed load with
    EngineOverloaded (429 analogue) instead of growing memory forever."""
    from promptir_tpu.serve.engine import EngineOverloaded

    _, params = tiny
    fn, started, gate = _gated_identity()
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=1, batch_timeout_ms=0.0,
        max_queue=2,
    ) as eng:
        f1 = eng.submit(make_img(0))   # taken by worker, blocks in fn
        assert started.wait(timeout=10)
        f2 = eng.submit(make_img(1))   # queued: inflight = 2 = max_queue
        with pytest.raises(EngineOverloaded):
            eng.submit(make_img(2))
        gate.set()
        assert f1.result(timeout=10).shape == make_img(0).shape
        assert f2.result(timeout=10).shape == make_img(1).shape
        s = eng.stats()
    assert s["rejected"] == 1 and s["requests"] == 2
    assert s["inflight"] == 0


def test_engine_request_timeout(tiny):
    """A request that waits longer than request_timeout_s before the
    device thread can take it resolves with RequestTimeout, not a hang."""
    from promptir_tpu.serve.engine import RequestTimeout

    _, params = tiny
    fn, started, gate = _gated_identity()
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=1, batch_timeout_ms=0.0,
        request_timeout_s=0.05,
    ) as eng:
        f1 = eng.submit(make_img(0))   # occupies the device thread
        assert started.wait(timeout=10)
        f2 = eng.submit(make_img(1))   # will age past the deadline
        import time

        time.sleep(0.15)
        gate.set()
        assert f1.result(timeout=10).shape == make_img(0).shape
        with pytest.raises(RequestTimeout):
            f2.result(timeout=10)
        s = eng.stats()
    assert s["timed_out"] == 1 and s["inflight"] == 0


def test_engine_close_fails_queued_requests(tiny):
    """close() must not abandon queued requests: callers blocked on their
    futures get EngineClosed instead of waiting forever (submit/close
    race and worker-leak hardening)."""
    from promptir_tpu.serve.engine import EngineClosed

    _, params = tiny
    fn, started, gate = _gated_identity()
    eng = InferenceEngine(
        fn, params, pad_base=8, max_batch=1, batch_timeout_ms=0.0
    )
    f1 = eng.submit(make_img(0))       # worker blocks in fn
    assert started.wait(timeout=10)
    f2 = eng.submit(make_img(1))       # still queued
    eng.close(join_timeout_s=0.2)      # worker is wedged; drain anyway
    with pytest.raises(EngineClosed):
        f2.result(timeout=10)
    with pytest.raises(EngineClosed):
        eng.submit(make_img(2))
    gate.set()                         # release the wedged forward
    assert f1.result(timeout=10).shape == make_img(0).shape
    eng.close()                        # idempotent; joins the worker


def test_http_server_restore_and_health(tiny, monkeypatch):
    from promptir_tpu.cli import serve as serve_cli

    fn, params = tiny

    # build_engine constructs its own model; patch to the module fixture's
    # tiny net so the test reuses the already-compiled forward
    def fake_build_engine(args):
        eng = InferenceEngine(
            fn, params, pad_base=args.pad_base, max_batch=args.max_batch,
            batch_timeout_ms=args.batch_timeout_ms,
        )
        return eng, {"model": "tiny", "backend": jax.default_backend(),
                     "device_count": jax.device_count(),
                     "max_batch": args.max_batch,
                     "pad_base": args.pad_base, "dtype": "float32"}

    monkeypatch.setattr(serve_cli, "build_engine", fake_build_engine)
    args = serve_cli.build_parser().parse_args(
        ["--port", "0", "--max_batch", "4", "--batch_timeout_ms", "1"]
    )
    httpd, eng = serve_cli.make_server(args)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz"
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["model"] == "tiny"

        from PIL import Image

        img = make_img(7)
        buf = io.BytesIO()
        Image.fromarray((img * 255).round().astype(np.uint8)).save(
            buf, format="PNG"
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            out = np.asarray(Image.open(io.BytesIO(r.read())), np.float32)
        # the uint8 PNG round-trip on both legs allows 1-step error
        ref = direct(
            fn, params, np.asarray(
                Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
                np.float32,
            ) / 255.0,
        )
        assert out.shape == img.shape
        assert np.abs(out - (ref * 255).round()).max() <= 1

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats"
        ) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1

        # unknown path -> 404
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
        assert ei.value.code == 404
    finally:
        httpd.shutdown()
        eng.close()


def test_engine_survives_cancelled_future(tiny):
    """A caller cancelling a queued future must not kill the worker:
    set_result on a cancelled future raises InvalidStateError, so the
    worker claims futures before running them and skips cancelled ones."""
    _, params = tiny
    fn, started, gate = _gated_identity()
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=1, batch_timeout_ms=0.0
    ) as eng:
        f1 = eng.submit(make_img(0))   # worker blocks in fn
        assert started.wait(timeout=10)
        f2 = eng.submit(make_img(1))   # queued behind the wedged forward
        assert f2.cancel()             # caller gives up
        gate.set()
        assert f1.result(timeout=10).shape == make_img(0).shape
        # the worker must still be alive and serving after the cancel
        f3 = eng.submit(make_img(2))
        assert f3.result(timeout=10).shape == make_img(2).shape
        assert eng.stats()["inflight"] == 0


def test_engine_compiles_plain_model_fn(tiny):
    """The engine must run batches through ONE compiled program even when
    the caller passes a plain (unjitted) model_fn — round-5 serve-bench
    lesson: an eager model.apply dispatches every op separately (measured
    37 s vs 80 ms per 8x224px batch through the TPU relay). A per-call
    counter distinguishes the two: under jit it ticks only at trace time,
    eagerly it ticks on every batch."""
    fn, params = tiny
    calls = {"n": 0}

    def plain_fn(p, x):
        calls["n"] += 1
        return fn(p, x)

    img = make_img(0)
    with InferenceEngine(
        fn, params, pad_base=8, max_batch=2, batch_timeout_ms=0.0
    ) as ref_eng:
        ref = ref_eng.restore(img)
    with InferenceEngine(
        plain_fn, params, pad_base=8, max_batch=2, batch_timeout_ms=0.0
    ) as eng:
        for _ in range(3):
            out = eng.restore(img)
    assert calls["n"] == 1, "plain model_fn ran eagerly (once per batch)"
    np.testing.assert_allclose(out, ref, atol=2e-5)
