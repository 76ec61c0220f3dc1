"""Serving CLI — HTTP inference server with dynamic batching.

The reference's deployment story ends at a serial batch-1 script
(/root/reference/demo.py:79-127). This server is the production path:
concurrent clients POST images; the engine (serve/engine.py) groups them
into fixed-shape compiled batches on the device thread.

Endpoints:
  POST /restore       image bytes (PNG/JPEG) -> restored PNG
  GET  /healthz       JSON: model, backend, device count, ready
  GET  /stats         JSON: request/batch counters, latency, shapes

Usage:
  python -m promptir_tpu.cli.serve --model promptir --ckpt_name ckpt.npz \
      --port 8000 --max_batch 8 --fused --dtype bfloat16 \
      --warmup 512x512
"""

from __future__ import annotations

import argparse
import io
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="promptir_tpu inference server")
    p.add_argument("--model", default="promptir")
    p.add_argument("--ckpt_name", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=8,
                   help="fixed device batch; short groups are zero-padded")
    p.add_argument("--batch_timeout_ms", type=float, default=5.0)
    p.add_argument("--pad_base", type=int, default=None,
                   help="pad inputs to multiples of this; default = the "
                        "model family's window-aligned base (8 for "
                        "PromptIR = demo parity, 64 for OCAB/CAMixer "
                        "X-Restormer, 128 for Uformer)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--fused", action="store_true",
                   help="fused Pallas transformer-block kernels (TPU)")
    p.add_argument("--num_blocks", type=int, nargs=4, default=None)
    p.add_argument("--num_refinement_blocks", type=int, default=None)
    p.add_argument("--dim", type=int, default=None)
    p.add_argument("--warmup", nargs="*", default=[],
                   help="HxW sizes to pre-compile, e.g. 512x512 256x256")
    p.add_argument("--tile_threshold_px", type=int, default=None,
                   help="images padded beyond this many pixels are served "
                        "via compiled overlap-blend tiling (bounds the "
                        "number of XLA programs for arbitrary inputs)")
    p.add_argument("--tile_size", type=int, default=128)
    p.add_argument("--tile_overlap", type=int, default=32)
    p.add_argument("--tile_chunk", type=int, default=8)
    p.add_argument("--max_queue", type=int, default=256,
                   help="in-flight request bound; submits beyond it are "
                        "rejected with HTTP 429 instead of queueing "
                        "without bound")
    p.add_argument("--request_timeout_s", type=float, default=None,
                   help="fail (504) requests that wait longer than this "
                        "before the device thread can take them")
    return p


def build_engine(args):
    """Construct (engine, info) — separated from main() so tests and
    embedding applications can run the server in-process."""
    import jax

    from promptir_tpu.cli.demo import model_kwargs
    from promptir_tpu.cli.test import load_params
    from promptir_tpu.models import create_model
    from promptir_tpu.serve.engine import InferenceEngine
    from promptir_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    kw = model_kwargs(args)
    if getattr(args, "dim", None) is not None:
        kw["dim"] = args.dim
    model = create_model(args.model, **kw)
    from promptir_tpu.cli.test import validation_shape

    params = load_params(
        model, args.ckpt_name, sample_shape=validation_shape(args.model)
    )

    @jax.jit
    def model_fn(p, x):
        return model.apply({"params": p}, x)

    engine = InferenceEngine(
        model_fn,
        params,
        pad_base=args.pad_base,
        max_batch=args.max_batch,
        batch_timeout_ms=args.batch_timeout_ms,
        tile_threshold_px=args.tile_threshold_px,
        tile_size=args.tile_size,
        tile_overlap=args.tile_overlap,
        tile_chunk=args.tile_chunk,
        max_queue=args.max_queue,
        request_timeout_s=args.request_timeout_s,
    )
    info = {
        "model": args.model,
        "backend": jax.default_backend(),
        "device_count": jax.device_count(),
        "max_batch": args.max_batch,
        "pad_base": args.pad_base,
        "dtype": args.dtype,
    }
    import numpy as np

    for size in args.warmup:
        h, w = (int(v) for v in size.lower().split("x"))
        engine.restore(np.zeros((h, w, 3), np.float32))
        print(f"warmed up {h}x{w}")
    return engine, info


class _Handler(BaseHTTPRequestHandler):
    engine = None
    info = None

    def _json(self, code: int, obj) -> None:
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *fa):  # quiet; stats endpoint instead
        pass

    def do_GET(self):
        if self.path == "/healthz":
            self._json(200, dict(self.info, status="ok"))
        elif self.path == "/stats":
            self._json(200, self.engine.stats())
        else:
            self._json(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/restore":
            self._json(404, {"error": f"unknown path {self.path}"})
            return
        import numpy as np
        from PIL import Image

        n = int(self.headers.get("Content-Length", 0))
        raw = self.rfile.read(n)
        try:
            img = np.asarray(
                Image.open(io.BytesIO(raw)).convert("RGB"), np.float32
            ) / 255.0
        except Exception as e:
            self._json(400, {"error": f"cannot decode image: {e}"})
            return
        from promptir_tpu.serve.engine import (
            EngineClosed,
            EngineOverloaded,
            RequestTimeout,
        )

        try:
            out = self.engine.restore(img)
        except EngineOverloaded as e:
            self._json(429, {"error": str(e)})
            return
        except RequestTimeout as e:
            self._json(504, {"error": str(e)})
            return
        except EngineClosed as e:
            self._json(503, {"error": str(e)})
            return
        except Exception as e:
            self._json(500, {"error": str(e)})
            return
        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(out, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        ).save(buf, format="PNG")
        body = buf.getvalue()
        self.send_response(200)
        self.send_header("Content-Type", "image/png")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def make_server(args):
    """(httpd, engine) ready for serve_forever(); port 0 -> ephemeral."""
    if args.pad_base is None:
        from promptir_tpu.parallel.spatial import pad_bases

        # windowed families (OCAB/CAMixer/Uformer) need every U-Net
        # level's grid window-aligned; pad-to-8 only covers PromptIR
        args.pad_base = pad_bases(args.model)[0]
    engine, info = build_engine(args)
    handler = type("Handler", (_Handler,), {"engine": engine, "info": info})
    httpd = ThreadingHTTPServer((args.host, args.port), handler)
    return httpd, engine


def main(argv=None):
    args = build_parser().parse_args(argv)
    httpd, engine = make_server(args)
    host, port = httpd.server_address[:2]
    print(f"serving {args.model} on http://{host}:{port} "
          f"(max_batch={args.max_batch}, pad_base={args.pad_base})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        engine.close()


if __name__ == "__main__":
    main()
