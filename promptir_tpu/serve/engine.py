"""Dynamic-batching inference engine — the serving runtime.

The reference's only deployment surface is a serial batch-1 script
(/root/reference/demo.py:79-127). This engine is the production analogue
for TPU serving: concurrent callers submit images of arbitrary size; a
single device-owner thread groups compatible requests into fixed-shape
batches and runs one compiled forward per group.

TPU-first design decisions:
  * **Static shapes only.** Each image is reflect-padded to a multiple of
    `pad_base` (demo.py:17-24 semantics) and batches are always padded to
    exactly `max_batch`, so the number of distinct XLA programs is bounded
    by the number of distinct padded (H, W) buckets — never by traffic
    patterns. With the persistent compile cache, warm shapes start in
    milliseconds.
  * **One device thread.** All JAX dispatch happens on the worker thread;
    callers only block on futures. No device-side locking is needed and
    the relay/ICI queue stays ordered.
  * **Shape-grouped batching.** The worker drains the queue for up to
    `batch_timeout_ms` collecting requests whose padded shape matches the
    oldest pending request; stragglers of other shapes keep their arrival
    order for the next cycle.
"""

from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

from promptir_tpu.eval.padding import target_size


class EngineOverloaded(RuntimeError):
    """Raised by submit() when the bounded request queue is full — the
    serving analogue of HTTP 429; callers should shed or retry with
    backoff rather than queue without bound."""


class EngineClosed(RuntimeError):
    """Set on futures still queued when the engine shuts down."""


class RequestTimeout(TimeoutError):
    """Set on a future whose request exceeded request_timeout_s before
    the device thread could run it."""


def pad_image_np(img: np.ndarray, base: int) -> np.ndarray:
    """Reflect-pad HWC to multiples of `base` (host-side, zero-copy when
    already aligned). Falls back to edge padding when a dimension is too
    small for reflect (pad width >= dim); padding is cropped off anyway."""
    h, w = img.shape[:2]
    th, tw = target_size(h, w, base)
    if (th, tw) == (h, w):
        return img
    mode = "reflect" if (th - h) < h and (tw - w) < w else "edge"
    return np.pad(img, ((0, th - h), (0, tw - w), (0, 0)), mode=mode)


class _Request:
    __slots__ = ("img", "future", "t_submit", "shape")

    def __init__(self, img: np.ndarray):
        self.img = img
        self.future: Future = Future()
        self.t_submit = time.perf_counter()
        self.shape = img.shape


class InferenceEngine:
    """Groups concurrent restore requests into compiled fixed-shape batches.

    Parameters
    ----------
    model_fn : ``(params, x_nhwc) -> y_nhwc`` forward. Jitted by the
        engine itself (with the output clip fused into the same program)
        unless ``jit_model=False`` — round-5 lesson: a caller passing a
        plain ``model.apply`` otherwise serves every batch EAGERLY,
        op-by-op (measured 37 s/batch vs 80 ms compiled at 8x224px on the
        tunneled v5e). Passing an already-jitted fn is fine (jit of jit
        inlines).
    params : model parameter pytree (already on device / replicated).
    jit_model : wrap model_fn in ``jax.jit`` (default). Set False only
        for model_fns with per-call host side effects (tests).
    pad_base : pad each image to multiples of this (8 = demo.py parity;
        use 64 to match the eval path's flip-pad granularity).
    max_batch : the fixed device batch. Every forward runs at exactly this
        batch size (short groups are zero-padded), so one padded (H, W)
        bucket costs exactly one compile.
    batch_timeout_ms : how long the worker waits to fill a batch once it
        holds at least one request. 0 disables waiting (latency-optimal,
        batch-1 groups under low concurrency).
    tile_threshold_px : images whose padded area exceeds this many pixels
        are served through the compiled overlap-blend tiler
        (eval/tiling.py) instead of a whole-image forward — unbounded
        input resolutions then reuse the fixed tile program instead of
        compiling one XLA program per oversized shape. None disables.
    """

    def __init__(
        self,
        model_fn: Callable,
        params,
        *,
        pad_base: int = 8,
        max_batch: int = 4,
        batch_timeout_ms: float = 5.0,
        clip: bool = True,
        tile_threshold_px: Optional[int] = None,
        tile_size: int = 128,
        tile_overlap: int = 32,
        tile_chunk: int = 8,
        channels: int = 3,
        max_queue: int = 256,
        request_timeout_s: Optional[float] = None,
        jit_model: bool = True,
    ):
        if jit_model:
            import jax
            import jax.numpy as jnp

            def _compiled(p, x, _fn=model_fn, _clip=bool(clip)):
                y = _fn(p, x)
                return jnp.clip(y, 0.0, 1.0) if _clip else y

            self._model_fn = jax.jit(_compiled)
            self._clip_in_fn = True
            # the tiler must blend UNclipped tile outputs and clip once at
            # the end (eval/tiling.py:114), or overlap seams shift
            self._tile_fn = jax.jit(model_fn)
        else:
            self._model_fn = model_fn
            self._clip_in_fn = False
            self._tile_fn = model_fn
        self._params = params
        self.channels = int(channels)
        self.pad_base = int(pad_base)
        self.max_batch = int(max_batch)
        self.batch_timeout_s = float(batch_timeout_ms) / 1e3
        self.clip = clip
        self.tile_threshold_px = tile_threshold_px
        self.tile_size = tile_size
        self.tile_overlap = tile_overlap
        self.tile_chunk = tile_chunk
        self.max_queue = int(max_queue)
        self.request_timeout_s = request_timeout_s

        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._pending: "collections.deque[_Request]" = collections.deque()
        self._lock = threading.Lock()
        self._inflight = 0  # submitted but not yet resolved (queue+pending+running)
        self._stats: Dict[str, float] = {
            "requests": 0,
            "batches": 0,
            "tiled_requests": 0,
            "rejected": 0,
            "timed_out": 0,
            "batch_fill_sum": 0.0,
            "latency_sum_s": 0.0,
            "latency_max_s": 0.0,
        }
        self._shapes_seen: set = set()
        self._closed = False
        self._worker = threading.Thread(
            target=self._run, name="promptir-serve-worker", daemon=True
        )
        self._worker.start()

    # ------------------------------------------------------------- API

    def submit(self, img_hwc: np.ndarray) -> Future:
        """Enqueue one HWC float [0,1] image; resolves to the restored
        HWC float array of the SAME spatial size.

        Raises ``EngineClosed`` after close(), ``EngineOverloaded`` when
        more than ``max_queue`` requests are already in flight (submit is
        load-shedding, not blocking)."""
        img = np.asarray(img_hwc, dtype=np.float32)
        if img.ndim != 3 or img.shape[2] != self.channels:
            # reject here, not in the worker: a wrong-channel image would
            # otherwise land in a (H, W) bucket with valid co-batched
            # requests and fail the whole group's futures
            raise ValueError(
                f"expected HW{self.channels} image, got shape {img.shape}"
            )
        req = _Request(img)
        # the closed-check and the put happen under the same lock close()
        # takes before enqueueing the sentinel, so no request can land
        # BEHIND the sentinel and starve its caller forever
        with self._lock:
            if self._closed:
                raise EngineClosed("engine is closed")
            if self._inflight >= self.max_queue:
                self._stats["rejected"] += 1
                raise EngineOverloaded(
                    f"{self._inflight} requests in flight (max_queue="
                    f"{self.max_queue}); retry with backoff"
                )
            self._inflight += 1
            self._q.put(req)
        return req.future

    def restore(self, img_hwc: np.ndarray) -> np.ndarray:
        return self.submit(img_hwc).result()

    def restore_many(self, imgs: Sequence[np.ndarray]) -> list:
        futs = [self.submit(im) for im in imgs]
        return [f.result() for f in futs]

    def stats(self) -> Dict[str, float]:
        with self._lock:
            s = dict(self._stats)
        n = max(1, int(s["requests"]))
        b = max(1, int(s["batches"]))
        return {
            "requests": int(s["requests"]),
            "batches": int(s["batches"]),
            "tiled_requests": int(s["tiled_requests"]),
            "rejected": int(s["rejected"]),
            "timed_out": int(s["timed_out"]),
            "mean_batch_fill": s["batch_fill_sum"] / b,
            "mean_latency_s": s["latency_sum_s"] / n,
            "max_latency_s": s["latency_max_s"],
            "compiled_shapes": len(self._shapes_seen),
            "queue_depth": self._q.qsize() + len(self._pending),
            "inflight": self._inflight_snapshot(),
        }

    def _inflight_snapshot(self) -> int:
        with self._lock:
            return self._inflight

    def close(self, join_timeout_s: float = 60.0) -> None:
        with self._lock:
            if self._closed:
                already = True
            else:
                already = False
                self._closed = True
                self._q.put(None)
        if already:
            self._worker.join(timeout=join_timeout_s)
            return
        self._worker.join(timeout=join_timeout_s)
        if self._worker.is_alive():
            # the worker is wedged mid-forward (device hang); requests it
            # holds can't be recovered, but don't leave callers of queued
            # requests blocking forever either
            pass
        # fail anything the worker never reached — the worker drains on a
        # clean exit, this catches the join-timeout path
        self._drain_failed(EngineClosed("engine closed before request ran"))

    def _drain_failed(self, exc: Exception) -> None:
        """Resolve every still-queued/parked request with `exc`."""
        leftovers = list(self._pending)
        self._pending.clear()
        saw_sentinel = False
        while True:
            try:
                r = self._q.get_nowait()
            except queue.Empty:
                break
            if r is None:
                saw_sentinel = True
            else:
                leftovers.append(r)
        if saw_sentinel:
            # keep the shutdown sentinel in the queue: a worker wedged in
            # a forward still needs it to exit once it unblocks (without
            # it, the worker parks in q.get() forever and every later
            # close() burns its full join timeout)
            self._q.put(None)
        for r in leftovers:
            self._resolve_exc(r, exc)

    def _resolve_exc(self, req: _Request, exc: Exception) -> None:
        with self._lock:
            self._inflight -= 1
        f = req.future
        try:
            if not f.running() and not f.set_running_or_notify_cancel():
                return  # caller cancelled it first — nothing to deliver
            f.set_exception(exc)
        except Exception:
            pass  # lost a cancel/claim race; the future is already settled

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---------------------------------------------------------- worker

    def _bucket(self, req: _Request) -> Tuple[int, int]:
        h, w = req.shape[:2]
        return target_size(h, w, self.pad_base)

    def _is_tiled(self, req: _Request) -> bool:
        if self.tile_threshold_px is None:
            return False
        th, tw = self._bucket(req)
        return th * tw > self.tile_threshold_px

    def _expire(self, req: _Request) -> bool:
        """True (and the future is failed) if the request waited longer
        than request_timeout_s before the device could take it."""
        if self.request_timeout_s is None:
            return False
        waited = time.perf_counter() - req.t_submit
        if waited <= self.request_timeout_s:
            return False
        with self._lock:
            self._stats["timed_out"] += 1
        self._resolve_exc(
            req,
            RequestTimeout(
                f"request queued {waited:.2f}s > "
                f"request_timeout_s={self.request_timeout_s}"
            ),
        )
        return True

    def _collect_group(self) -> Optional[list]:
        """Block for the oldest request, then gather up to max_batch
        requests sharing its padded bucket within the timeout."""
        head = None
        while head is None:
            if self._pending:
                head = self._pending.popleft()
            else:
                head = self._q.get()
                if head is None:
                    return None
            if self._expire(head):
                head = None
        if self._is_tiled(head):
            return [head]  # oversized images run alone via the tiler
        key = self._bucket(head)
        group = [head]
        deadline = time.perf_counter() + self.batch_timeout_s
        stash = []
        # same-bucket requests already parked from a previous cycle
        for r in list(self._pending):
            if len(group) >= self.max_batch:
                break
            if self._expire(r):
                self._pending.remove(r)
                continue
            if not self._is_tiled(r) and self._bucket(r) == key:
                self._pending.remove(r)
                group.append(r)
        while len(group) < self.max_batch:
            wait = deadline - time.perf_counter()
            if wait <= 0:
                break
            try:
                r = self._q.get(timeout=wait)
            except queue.Empty:
                break
            if r is None:
                self._q.put(None)  # re-post sentinel for shutdown
                break
            if self._expire(r):
                continue
            if not self._is_tiled(r) and self._bucket(r) == key:
                group.append(r)
            else:
                stash.append(r)
        self._pending.extend(stash)
        return group

    def _run(self) -> None:
        import jax.numpy as jnp

        while True:
            group = self._collect_group()
            if group is None:
                # clean shutdown: fail anything still queued or parked so
                # no caller blocks forever on an abandoned future
                self._drain_failed(
                    EngineClosed("engine closed before request ran")
                )
                break
            # claim each future before running it: a caller may cancel() a
            # pending future, and set_result on a cancelled future raises
            # InvalidStateError — which would kill this worker thread and
            # stop the engine serving entirely
            claimed = []
            for r in group:
                if r.future.set_running_or_notify_cancel():
                    claimed.append(r)
                else:
                    with self._lock:
                        self._inflight -= 1
            group = claimed
            if not group:
                continue
            tiled = self._is_tiled(group[0])
            try:
                if tiled:
                    from promptir_tpu.eval.tiling import tiled_inference

                    y = np.asarray(
                        tiled_inference(
                            self._tile_fn,
                            self._params,
                            jnp.asarray(group[0].img[None]),
                            tile=self.tile_size,
                            overlap=self.tile_overlap,
                            chunk=self.tile_chunk,
                            bucket=self.pad_base,
                        ),
                        dtype=np.float32,
                    )
                else:
                    th, tw = self._bucket(group[0])
                    c = group[0].shape[2]
                    xb = np.zeros((self.max_batch, th, tw, c), np.float32)
                    for i, r in enumerate(group):
                        xb[i] = pad_image_np(r.img, self.pad_base)
                    y = self._model_fn(self._params, jnp.asarray(xb))
                    if self.clip and not self._clip_in_fn:
                        y = jnp.clip(y, 0.0, 1.0)
                    # fetch in the model's native dtype (bf16 halves the
                    # host transfer — the dominant cost on tunneled
                    # relays), convert on host
                    y = np.asarray(y).astype(np.float32, copy=False)
            except Exception as e:  # surface compile/run errors to callers
                for r in group:
                    self._resolve_exc(r, e)
                continue
            now = time.perf_counter()
            with self._lock:
                if tiled:
                    self._stats["tiled_requests"] += 1
                    self._shapes_seen.add(
                        ("tile", self.tile_chunk, self.tile_size)
                    )
                else:
                    self._shapes_seen.add((self.max_batch, th, tw, c))
                self._stats["batches"] += 1
                self._stats["batch_fill_sum"] += len(group)
                for r in group:
                    self._stats["requests"] += 1
                    lat = now - r.t_submit
                    self._stats["latency_sum_s"] += lat
                    self._stats["latency_max_s"] = max(
                        self._stats["latency_max_s"], lat
                    )
            for i, r in enumerate(group):
                h, w = r.shape[:2]
                with self._lock:
                    self._inflight -= 1
                r.future.set_result(y[i, :h, :w, :])
