"""Production serving: dynamic request batching for `Phenaki.sample`.

The reference has no serving story (library only). On TPU, sampling is one
compiled program whose throughput rises steeply with batch (BASELINE.md:
84 ms at b=1 vs 11.5 videos/s at b=8 — the decode transformer is
launch-bound at small batch), so a server should coalesce concurrent
requests into one device launch.

`PhenakiServer` implements the standard dynamic-batching loop:

  * callers submit prompts (text or precomputed embeddings) and get a
    Future;
  * a dispatcher thread drains the queue, waits up to `max_delay_ms` for
    more requests (latency/throughput knob), pads the batch to the nearest
    compiled bucket size (static shapes — XLA compiles once per bucket;
    `prewarm()` pays every bucket's compile up front), runs ONE `sample`,
    and resolves the futures;
  * text encoding (host-side T5/hash) runs in the dispatcher, off the
    caller threads; the device queue never sees partial batches. Mixed
    text/embeds batches are fine: text requests are encoded first so the
    whole batch reduces to embeddings.

Overload behavior is explicit (round-2 review): the submit queue is BOUNDED
(`max_queue`) and sheds load by failing the future with `ServerOverloaded`
instead of buffering a burst until the host OOMs; the resolver queue is
bounded too (blocking the dispatcher = backpressure on the device pipeline,
at most `resolve_depth` launches in flight). Each request may carry a
`deadline` (seconds): requests that expire while queued are dropped at
batch-assembly time with `DeadlineExceeded` rather than occupying a device
slot.

Every request carries its own fold of the server rng so identical prompts
in one batch still decode different videos, while a fixed `seed` makes the
whole server deterministic per (arrival-order, bucket) schedule.

`serve_http` wraps a server in a minimal JSON/HTTP front end (stdlib only)
for smoke deployments: POST /generate {"text": ...} -> {"video": base64
gif}. Production deployments should put a real gateway in front; the
batching core is the reusable piece.
"""

from __future__ import annotations

import base64
import json
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ServerOverloaded(RuntimeError):
    """Submit queue full — request shed at admission."""


class DeadlineExceeded(TimeoutError):
    """Request expired before a device slot was available."""


class _Request:
    __slots__ = (
        "text",
        "text_embeds",
        "future",
        "deadline_ts",
        "scene_texts",
        "scene_num_frames",
        "prime_lengths",
        "prime_video",
    )

    def __init__(
        self,
        text,
        text_embeds,
        deadline_ts,
        scene_texts=None,
        scene_num_frames=None,
        prime_lengths=None,
        prime_video=None,
    ):
        self.text = text
        self.text_embeds = text_embeds
        self.deadline_ts = deadline_ts  # monotonic seconds or None
        # multi-scene (make_video) request: list of per-scene prompts plus
        # the static chaining structure. None for single-scene requests.
        self.scene_texts = scene_texts
        self.scene_num_frames = scene_num_frames
        self.prime_lengths = prime_lengths
        # client-uploaded (f, H, W, c) frames priming scene 0 — the serving
        # face of the reference's prime_frames continuation
        # (phenaki_pytorch.py:440-447): continue an EXISTING video
        self.prime_video = prime_video
        self.future: Future = Future()

    def expired(self) -> bool:
        return self.deadline_ts is not None and time.monotonic() > self.deadline_ts

    def signature(self):
        """Launch-compatibility key: requests in one device launch must share
        the compiled program structure (scene count, frames, prime lengths,
        uploaded-prime shape). Single-scene requests all share the default
        signature."""
        if self.scene_texts is None:
            return None
        prime_shape = (
            None if self.prime_video is None else tuple(self.prime_video.shape)
        )
        return (self.scene_num_frames, self.prime_lengths, prime_shape)


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return buckets[-1]


class PhenakiServer:
    """Dynamic-batching sampler around a (trained) `Phenaki` model.

    Parameters mirror `Phenaki.sample`; `batch_buckets` are the compiled
    batch sizes (requests pad up to the nearest bucket; oversize bursts
    split across launches). `max_queue` bounds admitted-but-unbatched
    requests (0 = unbounded); `resolve_depth` bounds launches whose results
    are still being delivered (dispatcher blocks when full)."""

    def __init__(
        self,
        phenaki,
        *,
        num_frames: int = 17,
        cond_scale: float = 5.0,
        starting_temperature: float = 0.9,
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        max_delay_ms: float = 20.0,
        seed: int = 0,
        mesh=None,
        output_dtype: str = "uint8",  # or "float32"
        max_queue: int = 256,
        resolve_depth: int = 4,
    ):
        assert phenaki.params is not None, "model must be initialized/loaded"
        assert output_dtype in ("uint8", "float32")
        self.model = phenaki
        self.num_frames = num_frames
        self.cond_scale = cond_scale
        self.starting_temperature = starting_temperature
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.max_delay_ms = max_delay_ms
        self.mesh = mesh
        # uint8 output quantizes on DEVICE before the host fetch — 4x less
        # transfer than fp32 pixels (the dominant serving cost on hosts with
        # modest device links), and the GIF/display pipeline is 8-bit anyway
        self.output_dtype = output_dtype
        self._to_u8 = jax.jit(
            lambda v: jnp.clip(v * 255.0, 0.0, 255.0).astype(jnp.uint8)
        )
        self._rng = jax.random.PRNGKey(seed)
        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue(
            maxsize=max_queue
        )
        self._launches: List[Tuple[int, int]] = []  # (requests, bucket)
        self._shed = 0  # admission rejections (telemetry)
        self._expired = 0  # deadline drops (telemetry)
        self._closed = False
        self._close_lock = threading.Lock()
        # the dispatcher never blocks on device->host transfers: completed
        # launches hand off to the resolver thread, so batch k+1's compute
        # overlaps batch k's result delivery. BOUNDED: when resolve_depth
        # launches are undelivered the dispatcher blocks (backpressure)
        # instead of queueing device arrays without limit.
        self._resolve_q: "queue.Queue" = queue.Queue(maxsize=resolve_depth)
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()
        self._resolver = threading.Thread(target=self._resolve_loop, daemon=True)
        self._resolver.start()

    # ------------------------------------------------------------------ #
    # client API                                                          #
    # ------------------------------------------------------------------ #

    def submit(
        self,
        text: Optional[str] = None,
        text_embeds=None,
        deadline: Optional[float] = None,
    ) -> Future:
        """Enqueue one prompt; resolves to a (f, H, W, c) video array.

        `deadline` (seconds from now): if the request is still queued when
        it expires, its future fails with DeadlineExceeded. If the admission
        queue is full the future fails immediately with ServerOverloaded."""
        assert (text is None) != (text_embeds is None), (
            "pass exactly one of text / text_embeds"
        )
        deadline_ts = None if deadline is None else time.monotonic() + deadline
        req = _Request(text, text_embeds, deadline_ts)
        return self._admit(req)

    def submit_video(
        self,
        texts: Sequence[str],
        num_frames=None,
        prime_lengths=5,
        prime_video=None,
        deadline: Optional[float] = None,
    ) -> Future:
        """Enqueue a multi-scene `make_video` request (the reference's
        headline long-video capability, phenaki_pytorch.py:692-714): one
        prompt per scene, each scene primed on the last `prime_lengths`
        frames of the previous. Resolves to the full chained
        (sum(num_frames), H, W, c) video.

        `num_frames`: int or per-scene sequence (default: the server's
        single-scene `num_frames` for every scene). `prime_lengths`: int or
        per-(scene-gap) sequence of length len(texts)-1. `prime_video`:
        optional (f, H, W, c) float [0,1] or uint8 frames the client already
        has — scene 0 continues FROM them (the reference's prime_frames
        path, phenaki_pytorch.py:440-447), so a client can extend a
        previously generated or uploaded video.

        Requests sharing the same (num_frames, prime_lengths, prime shape)
        structure batch into one sequence of device launches (one per
        scene); differing structures run as separate launches since they
        compile to different programs."""
        texts = list(texts)
        assert len(texts) >= 1, "need at least one scene prompt"
        n_scenes = len(texts)
        if num_frames is None:
            num_frames = self.num_frames
        if isinstance(num_frames, int):
            num_frames = (num_frames,) * n_scenes
        num_frames = tuple(int(f) for f in num_frames)
        assert len(num_frames) == n_scenes
        if isinstance(prime_lengths, int):
            prime_lengths = (prime_lengths,) * (n_scenes - 1)
        prime_lengths = tuple(int(p) for p in prime_lengths)
        assert len(prime_lengths) == n_scenes - 1, (
            "prime_lengths must have one entry per scene transition"
        )
        if prime_video is not None:
            prime_video = np.asarray(prime_video)
            if prime_video.dtype == np.uint8:
                prime_video = prime_video.astype(np.float32) / 255.0
            prime_video = prime_video.astype(np.float32)
            assert prime_video.ndim == 4, "prime_video must be (f, H, W, c)"
        deadline_ts = None if deadline is None else time.monotonic() + deadline
        req = _Request(
            None,
            None,
            deadline_ts,
            scene_texts=texts,
            scene_num_frames=num_frames,
            prime_lengths=prime_lengths,
            prime_video=prime_video,
        )
        return self._admit(req)

    def _admit(self, req: _Request) -> Future:
        with self._close_lock:
            if self._closed:
                req.future.set_exception(RuntimeError("server is closed"))
                return req.future
            try:
                self._queue.put_nowait(req)
            except queue.Full:
                self._shed += 1
                req.future.set_exception(
                    ServerOverloaded(
                        f"submit queue full ({self._queue.maxsize} pending)"
                    )
                )
        return req.future

    def generate(self, texts: Sequence[str]) -> np.ndarray:
        """Synchronous convenience: submit all, wait, stack."""
        futures = [self.submit(text=t) for t in texts]
        return np.stack([f.result() for f in futures])

    def prewarm(self):
        """Compile every batch bucket up front (one dummy launch each) so no
        real request pays a cold XLA compile. Blocking; call before serving."""
        dummy = np.zeros(
            (1, self.model.max_text_len, self.model.text_embed_dim), np.float32
        )
        for b in self.batch_buckets:
            embeds = np.repeat(dummy, b, axis=0)
            videos = self.model.sample(
                num_frames=self.num_frames,
                text_embeds=embeds,
                cond_scale=self.cond_scale,
                starting_temperature=self.starting_temperature,
                rng=jax.random.PRNGKey(0),
                mesh=self.mesh,
            )
            if self.output_dtype == "uint8":
                videos = self._to_u8(videos)
            jax.block_until_ready(videos)

    def close(self):
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
        self._queue.put(None)
        self._thread.join(timeout=60)
        self._resolve_q.put(None)
        self._resolver.join(timeout=60)
        # drain anything that raced the sentinel (ADVICE r2: a submit racing
        # close() could land behind the None and hang its caller forever)
        self._fail_pending(RuntimeError("server is closed"))

    def _fail_pending(self, exc: Exception):
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                break
            if item is not None and not item.future.done():
                item.future.set_exception(exc)
        while True:
            try:
                item = self._resolve_q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            _, batch = item
            for req in batch:
                if not req.future.done():
                    req.future.set_exception(exc)

    @property
    def launch_log(self) -> List[Tuple[int, int]]:
        """(num_real_requests, bucket_size) per device launch (telemetry)."""
        return list(self._launches)

    @property
    def stats(self) -> dict:
        return {
            "launches": len(self._launches),
            "shed": self._shed,
            "expired": self._expired,
            "pending": self._queue.qsize(),
        }

    # ------------------------------------------------------------------ #
    # dispatcher                                                          #
    # ------------------------------------------------------------------ #

    def _collect(self) -> Optional[List[_Request]]:
        """Block for the first live request, then coalesce up to max bucket
        for at most max_delay_ms. Expired requests are failed and dropped."""
        while True:
            first = self._queue.get()
            if first is None:
                return None
            if first.expired():
                self._drop_expired(first)
                continue
            break
        batch = [first]
        max_b = self.batch_buckets[-1]
        deadline = self.max_delay_ms / 1000.0

        t0 = time.monotonic()
        while len(batch) < max_b:
            remaining = deadline - (time.monotonic() - t0)
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req is None:
                self._queue.put(None)  # re-signal shutdown for next loop
                break
            if req.expired():
                self._drop_expired(req)
                continue
            batch.append(req)
        return batch

    def _drop_expired(self, req: _Request):
        self._expired += 1
        if not req.future.done():
            req.future.set_exception(
                DeadlineExceeded("request expired before batching")
            )

    def _dispatch_loop(self):
        while True:
            batch = self._collect()
            if batch is None:
                return
            # one launch (sequence) per compiled-program signature: single-
            # scene requests all share signature None; multi-scene requests
            # group by their (num_frames, prime_lengths) structure
            groups: dict = {}
            for req in batch:
                groups.setdefault(req.signature(), []).append(req)
            for sig, group in groups.items():
                try:
                    if sig is None:
                        self._run_batch(group)
                    else:
                        self._run_video_batch(group)
                except Exception as e:  # resolve futures, keep serving
                    for req in group:
                        if not req.future.done():
                            req.future.set_exception(e)

    def _run_batch(self, batch: List[_Request]):
        n = len(batch)
        bucket = _bucket(n, self.batch_buckets)

        # mixed batches: encode the text requests so everything is embeds
        # (ADVICE r2: a text + embeds pair used to fail the whole batch)
        text_idx = [i for i, r in enumerate(batch) if r.text is not None]
        rows: List[Optional[np.ndarray]] = [
            None if r.text_embeds is None else np.asarray(r.text_embeds)
            for r in batch
        ]
        if text_idx:
            encoded = self.model.embed_texts([batch[i].text for i in text_idx])
            for slot, i in enumerate(text_idx):
                rows[i] = np.asarray(encoded[slot])
        embeds = np.stack(rows)
        # pad rows to the bucket (repeat last row; outputs discarded)
        if bucket != n:
            pad = np.repeat(embeds[-1:], bucket - n, axis=0)
            embeds = np.concatenate([embeds, pad], axis=0)

        self._rng, sub = jax.random.split(self._rng)
        videos = self.model.sample(
            num_frames=self.num_frames,
            text_embeds=embeds,
            cond_scale=self.cond_scale,
            starting_temperature=self.starting_temperature,
            rng=sub,
            mesh=self.mesh,
        )
        if self.output_dtype == "uint8":
            videos = self._to_u8(videos)
        self._launches.append((n, bucket))
        # async handoff: the fetch happens on the resolver thread while the
        # dispatcher assembles/launches the next batch (blocks at
        # resolve_depth undelivered launches = backpressure)
        self._resolve_q.put((videos, batch))

    def _run_video_batch(self, batch: List[_Request]):
        """One signature-group of multi-scene requests: scene-by-scene prime
        chaining (models/phenaki.py make_video) where each scene is ONE
        batched device launch over the whole group. The prime frames stay on
        device between scenes — only the final chained video crosses to host."""
        n = len(batch)
        bucket = _bucket(n, self.batch_buckets)
        scene_num_frames = batch[0].scene_num_frames
        prime_lengths = (*batch[0].prime_lengths, 0)  # last scene: no prime

        # client-uploaded prime for scene 0 (same shape across the group —
        # it is part of the launch signature); pad rows to the bucket
        video_prime = None
        if batch[0].prime_video is not None:
            video_prime = np.stack([r.prime_video for r in batch])
            if bucket != n:
                pad = np.repeat(video_prime[-1:], bucket - n, axis=0)
                video_prime = np.concatenate([video_prime, pad], axis=0)
            video_prime = jnp.asarray(video_prime)
        scenes = []
        for s, (frames, next_prime) in enumerate(
            zip(scene_num_frames, prime_lengths)
        ):
            encoded = self.model.embed_texts(
                [r.scene_texts[s] for r in batch]
            )
            embeds = np.asarray(encoded)
            if bucket != n:
                pad = np.repeat(embeds[-1:], bucket - n, axis=0)
                embeds = np.concatenate([embeds, pad], axis=0)
            self._rng, sub = jax.random.split(self._rng)
            video = self.model.sample(
                num_frames=frames,
                text_embeds=embeds,
                prime_frames=video_prime,
                cond_scale=self.cond_scale,
                starting_temperature=self.starting_temperature,
                rng=sub,
                mesh=self.mesh,
            )
            scenes.append(video)
            video_prime = video[:, -next_prime:] if next_prime > 0 else None
            self._launches.append((n, bucket))

        full = jnp.concatenate(scenes, axis=1)
        if self.output_dtype == "uint8":
            full = self._to_u8(full)
        self._resolve_q.put((full, batch))

    def _resolve_loop(self):
        while True:
            item = self._resolve_q.get()
            if item is None:
                return
            videos, batch = item
            try:
                host = np.asarray(jax.device_get(videos))
                for i, req in enumerate(batch):
                    req.future.set_result(host[i])
            except Exception as e:
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(e)


# ---------------------------------------------------------------------- #
# minimal HTTP front end (stdlib only)                                   #
# ---------------------------------------------------------------------- #


def _video_to_gif_b64(video: np.ndarray) -> str:
    from phenaki_tpu.data.codecs import video_tensor_to_gif
    import tempfile, os

    if video.dtype == np.uint8:
        video = video.astype(np.float32) / 255.0
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "v.gif")
        video_tensor_to_gif(np.clip(video, 0.0, 1.0), path)
        with open(path, "rb") as f:
            return base64.b64encode(f.read()).decode()


def _gif_b64_to_video(b64: str) -> np.ndarray:
    """Inverse of `_video_to_gif_b64`: base64 GIF -> (f, H, W, c) float32."""
    from phenaki_tpu.data.codecs import gif_to_tensor
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "v.gif")
        with open(path, "wb") as f:
            f.write(base64.b64decode(b64))
        return np.asarray(gif_to_tensor(path), np.float32)


def serve_http(
    server: PhenakiServer,
    port: int = 8089,
    max_requests=None,
    request_timeout: float = 120.0,
):
    """Blocking JSON/HTTP endpoint: POST /generate {"text": "..."} ->
    {"video_gif_b64": ...}; GET /healthz -> ok, /stats -> telemetry JSON.
    `max_requests` bounds the serve loop (for tests). Each request carries a
    `request_timeout`-second deadline end to end; expiry returns 503."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok"
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/stats":
                self._json(200, server.stats)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path not in ("/generate", "/generate_video"):
                self.send_response(404)
                self.end_headers()
                return
            length = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(length) or b"{}")
            try:
                if self.path == "/generate":
                    future = server.submit(
                        text=payload["text"], deadline=request_timeout
                    )
                else:
                    # multi-scene make_video: {"texts": [...],
                    # "num_frames": int|[...], "prime_lengths": int|[...],
                    # "prime_video_b64": optional base64 GIF whose last
                    # frames prime scene 0 — continue an uploaded video}
                    prime_video = None
                    if payload.get("prime_video_b64"):
                        prime_video = _gif_b64_to_video(
                            payload["prime_video_b64"]
                        )
                        n_prime = payload.get("prime_frames")
                        if n_prime:  # client may send more frames than used
                            prime_video = prime_video[-int(n_prime):]
                    future = server.submit_video(
                        payload["texts"],
                        num_frames=payload.get("num_frames"),
                        prime_lengths=payload.get("prime_lengths", 5),
                        prime_video=prime_video,
                        deadline=request_timeout,
                    )
                video = future.result(timeout=request_timeout)
                self._json(200, {"video_gif_b64": _video_to_gif_b64(video)})
            except (ServerOverloaded, DeadlineExceeded, TimeoutError) as e:
                self._json(503, {"error": str(e)})
            except Exception as e:
                self._json(500, {"error": str(e)})

    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    if max_requests is None:
        httpd.serve_forever()
    else:
        for _ in range(max_requests):
            httpd.handle_request()
    httpd.server_close()
    return httpd
