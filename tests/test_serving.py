"""Dynamic-batching server (phenaki_tpu/serving.py): coalescing, bucket
padding, per-request rng decorrelation, error isolation, HTTP front end."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.maskgit import MaskGit
from phenaki_tpu.models.phenaki import Phenaki
from phenaki_tpu.serving import PhenakiServer, serve_http

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier

TEXT_DIM = 16


@pytest.fixture(scope="module")
def tiny_phenaki():
    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        dim_context=TEXT_DIM,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=2,
        text_embed_dim=TEXT_DIM, max_text_len=4,
    )
    ph.init(jax.random.PRNGKey(1))
    return ph


def test_server_batches_concurrent_requests(tiny_phenaki):
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0,
        batch_buckets=(1, 2, 4), max_delay_ms=200.0, seed=0,
    )
    try:
        embeds = np.random.RandomState(0).randn(4, 3, TEXT_DIM).astype(np.float32)
        futures = [server.submit(text_embeds=embeds[i]) for i in range(3)]
        videos = [f.result(timeout=300) for f in futures]
        for v in videos:
            assert v.shape == (3, 16, 16, 3)
            assert np.isfinite(v).all()
        # the three concurrent submits coalesced (<= 2 launches, and at
        # least one multi-request launch)
        log = server.launch_log
        assert sum(n for n, _ in log) == 3
        assert len(log) <= 2
        assert any(n > 1 for n, _ in log)
        # bucket padding: a 3-request batch runs at bucket 4
        assert all(b in (1, 2, 4) for _, b in log)
    finally:
        server.close()


def test_server_decorrelates_identical_prompts(tiny_phenaki):
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0,
        batch_buckets=(2,), max_delay_ms=300.0, seed=1,
    )
    try:
        emb = np.random.RandomState(1).randn(3, TEXT_DIM).astype(np.float32)
        f1 = server.submit(text_embeds=emb)
        f2 = server.submit(text_embeds=emb)
        v1, v2 = f1.result(timeout=300), f2.result(timeout=300)
        assert not np.allclose(v1, v2), (
            "identical prompts in one batch must sample different videos"
        )
    finally:
        server.close()


def test_server_isolates_request_errors(tiny_phenaki):
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(1, 2), max_delay_ms=5.0,
    )
    try:
        bad = server.submit(text_embeds=np.zeros((5, 5, 5, 5)))  # bad shape
        with pytest.raises(Exception):
            bad.result(timeout=300)
        # server keeps serving after a failed batch
        emb = np.random.RandomState(2).randn(3, TEXT_DIM).astype(np.float32)
        ok = server.submit(text_embeds=emb).result(timeout=300)
        assert ok.shape == (3, 16, 16, 3)
    finally:
        server.close()


def test_http_front_end(tiny_phenaki):
    import json
    import urllib.request

    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
        max_delay_ms=1.0,
    )
    port = 18907
    t = threading.Thread(
        target=serve_http, args=(server, port), kwargs={"max_requests": 2},
        daemon=True,
    )
    t.start()
    time.sleep(0.3)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"text": "a bouncing ball"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            payload = json.loads(r.read())
        assert "video_gif_b64" in payload and len(payload["video_gif_b64"]) > 100
    finally:
        t.join(timeout=10)
        server.close()


def test_uint8_output_matches_quantized_float(tiny_phenaki):
    from phenaki_tpu.serving import PhenakiServer as PS

    emb = np.random.RandomState(5).randn(3, TEXT_DIM).astype(np.float32)
    s_u8 = PS(tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
              max_delay_ms=1.0, seed=7, output_dtype="uint8")
    s_f32 = PS(tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
               max_delay_ms=1.0, seed=7, output_dtype="float32")
    try:
        v_u8 = s_u8.submit(text_embeds=emb).result(timeout=300)
        v_f32 = s_f32.submit(text_embeds=emb).result(timeout=300)
        assert v_u8.dtype == np.uint8 and v_f32.dtype == np.float32
        expected = np.clip(v_f32 * 255.0, 0, 255).astype(np.uint8)
        # same seed + same request order -> same video; uint8 is the exact
        # on-device quantization of the float output
        np.testing.assert_array_equal(v_u8, expected)
    finally:
        s_u8.close()
        s_f32.close()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_server_with_mesh_sharded_sampling(tiny_phenaki):
    from phenaki_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:4], tp=1)
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(4,),
        max_delay_ms=300.0, mesh=mesh,
    )
    try:
        embeds = np.random.RandomState(6).randn(4, 3, TEXT_DIM).astype(np.float32)
        futures = [server.submit(text_embeds=embeds[i]) for i in range(4)]
        videos = [f.result(timeout=300) for f in futures]
        assert all(v.shape == (3, 16, 16, 3) for v in videos)
        assert any(n == 4 for n, _ in server.launch_log), (
            "4 requests should coalesce into one mesh-sharded launch"
        )
    finally:
        server.close()


def test_server_sheds_load_when_queue_full(tiny_phenaki):
    from phenaki_tpu.serving import ServerOverloaded

    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(1,), max_delay_ms=1.0,
        max_queue=2,
    )
    try:
        emb = np.random.RandomState(3).randn(3, TEXT_DIM).astype(np.float32)
        # flood far beyond the 2-deep admission queue; some must be shed
        # with ServerOverloaded instead of buffering without bound
        futures = [server.submit(text_embeds=emb) for _ in range(30)]
        outcomes = []
        for f in futures:
            try:
                f.result(timeout=300)
                outcomes.append("ok")
            except ServerOverloaded:
                outcomes.append("shed")
        assert "shed" in outcomes, "bounded queue must shed a 30-burst"
        assert "ok" in outcomes, "admitted requests must still be served"
        assert server.stats["shed"] == outcomes.count("shed")
    finally:
        server.close()


def test_server_deadline_expiry(tiny_phenaki):
    from phenaki_tpu.serving import DeadlineExceeded

    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(1,), max_delay_ms=1.0,
    )
    try:
        emb = np.random.RandomState(4).randn(3, TEXT_DIM).astype(np.float32)
        # occupy the dispatcher with a real request, then submit one whose
        # deadline is already unreachable — it must fail, not hang
        busy = server.submit(text_embeds=emb)
        doomed = server.submit(text_embeds=emb, deadline=0.0)
        with pytest.raises(DeadlineExceeded):
            doomed.result(timeout=300)
        busy.result(timeout=300)
        assert server.stats["expired"] >= 1
    finally:
        server.close()


def test_server_mixed_text_and_embeds_batch(tiny_phenaki):
    """A batch mixing a text request with a text_embeds request must run
    (text encoded in the dispatcher), not trip an assert (ADVICE r2)."""
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(2,), max_delay_ms=500.0,
    )
    try:
        emb = np.random.RandomState(5).randn(4, TEXT_DIM).astype(np.float32)
        f_text = server.submit(text="a red square moving right")
        f_emb = server.submit(text_embeds=emb)
        v1, v2 = f_text.result(timeout=300), f_emb.result(timeout=300)
        assert v1.shape == (3, 16, 16, 3) and v2.shape == (3, 16, 16, 3)
        assert any(n == 2 for n, _ in server.launch_log), (
            "mixed pair should coalesce into one launch"
        )
    finally:
        server.close()


def test_server_close_fails_stragglers(tiny_phenaki):
    """Requests that race close() must get an exception, never hang."""
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(1,), max_delay_ms=1.0,
    )
    emb = np.random.RandomState(6).randn(3, TEXT_DIM).astype(np.float32)
    first = server.submit(text_embeds=emb)
    server.close()
    # after close: new submits fail fast with an exception
    late = server.submit(text_embeds=emb)
    with pytest.raises(Exception):
        late.result(timeout=10)
    # the in-flight request either completed or was failed — never pending
    assert first.done() or first.exception(timeout=10) is not None


def test_server_multi_scene_video(tiny_phenaki):
    """submit_video chains scenes with prime frames (make_video through the
    serving layer — reference phenaki_pytorch.py:692-714) and same-structure
    requests coalesce into shared per-scene launches."""
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1, 2),
        max_delay_ms=500.0, seed=3,
    )
    try:
        f1 = server.submit_video(
            ["a red square", "it moves right"], num_frames=(3, 4), prime_lengths=1
        )
        f2 = server.submit_video(
            ["a blue circle", "it moves left"], num_frames=(3, 4), prime_lengths=1
        )
        v1, v2 = f1.result(timeout=600), f2.result(timeout=600)
        # 3-frame scene + 4-frame primed scene chained -> 7 frames total
        # (primed scenes add a multiple of temporal_patch_size new frames)
        assert v1.shape == (7, 16, 16, 3) and v2.shape == (7, 16, 16, 3)
        assert np.isfinite(v1).all() and not np.allclose(v1, v2)
        # same structure -> coalesced: each of the 2 scene launches carries
        # both requests
        assert any(n == 2 for n, _ in server.launch_log), server.launch_log
    finally:
        server.close()


def test_server_mixed_single_and_video_requests(tiny_phenaki):
    """A single-scene submit and a multi-scene submit_video arriving together
    run as separate signature groups in one dispatch — both must resolve."""
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1, 2),
        max_delay_ms=500.0,
    )
    try:
        emb = np.random.RandomState(8).randn(3, TEXT_DIM).astype(np.float32)
        f_single = server.submit(text_embeds=emb)
        f_video = server.submit_video(
            ["one scene", "two scene"], num_frames=(3, 4), prime_lengths=1
        )
        assert f_single.result(timeout=600).shape == (3, 16, 16, 3)
        assert f_video.result(timeout=600).shape == (7, 16, 16, 3)
    finally:
        server.close()


def test_http_generate_video_endpoint(tiny_phenaki):
    import json
    import urllib.request

    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
        max_delay_ms=1.0,
    )
    port = 18909
    t = threading.Thread(
        target=serve_http, args=(server, port), kwargs={"max_requests": 1},
        daemon=True,
    )
    t.start()
    time.sleep(0.3)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate_video",
            data=json.dumps(
                {
                    "texts": ["a ball appears", "the ball bounces"],
                    "num_frames": [3, 4],
                    "prime_lengths": 1,
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert "video_gif_b64" in payload and len(payload["video_gif_b64"]) > 100
    finally:
        t.join(timeout=10)
        server.close()


def test_server_prewarm_compiles_buckets(tiny_phenaki):
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, batch_buckets=(1, 2), max_delay_ms=1.0,
    )
    try:
        server.prewarm()  # compiles both buckets; must not throw
        emb = np.random.RandomState(7).randn(3, TEXT_DIM).astype(np.float32)
        v = server.submit(text_embeds=emb).result(timeout=300)
        assert v.shape == (3, 16, 16, 3)
    finally:
        server.close()


def test_http_generate_video_with_uploaded_prime(tiny_phenaki):
    """Round-4 review #8: a client continues from frames it UPLOADS — two
    chained scenes over HTTP where scene 0 is primed on a client GIF."""
    import base64
    import io
    import json
    import os
    import tempfile
    import urllib.request

    from phenaki_tpu.data.codecs import video_tensor_to_gif

    # the client-side video to continue from (any past generation/upload)
    prime = np.random.RandomState(5).rand(3, 16, 16, 3).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.gif")
        video_tensor_to_gif(prime, path)
        prime_b64 = base64.b64encode(open(path, "rb").read()).decode()

    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
        max_delay_ms=1.0,
    )
    port = 18911
    t = threading.Thread(
        target=serve_http, args=(server, port), kwargs={"max_requests": 1},
        daemon=True,
    )
    t.start()
    time.sleep(0.3)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate_video",
            data=json.dumps(
                {
                    "texts": ["continue this video", "then pan away"],
                    # scene 0 is PRIMED (on the upload) so its new frames
                    # must be a multiple of temporal_patch_size (2)
                    "num_frames": [4, 4],
                    "prime_lengths": 1,
                    "prime_video_b64": prime_b64,
                    "prime_frames": 1,  # use the last uploaded frame
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            payload = json.loads(r.read())
        assert "video_gif_b64" in payload
        # decode the returned GIF: 3 + 4 chained frames, client prime excluded
        from phenaki_tpu.serving import _gif_b64_to_video

        video = _gif_b64_to_video(payload["video_gif_b64"])
        assert video.shape == (8, 16, 16, 3)
    finally:
        t.join(timeout=10)
        server.close()


def test_submit_video_uploaded_prime_coalesces(tiny_phenaki):
    """Two submit_video requests with SAME-shape uploaded primes share the
    per-scene launches; the prime shape is part of the launch signature."""
    rs = np.random.RandomState(7)
    prime_a = rs.rand(1, 16, 16, 3).astype(np.float32)
    prime_b = rs.rand(1, 16, 16, 3).astype(np.float32)
    server = PhenakiServer(
        tiny_phenaki, num_frames=3, cond_scale=2.0, batch_buckets=(1, 2),
        max_delay_ms=500.0, seed=9,
    )
    try:
        f1 = server.submit_video(
            ["go left"], num_frames=(4,), prime_lengths=(), prime_video=prime_a
        )
        f2 = server.submit_video(
            ["go right"], num_frames=(4,), prime_lengths=(), prime_video=prime_b
        )
        v1, v2 = f1.result(timeout=600), f2.result(timeout=600)
        assert v1.shape == (4, 16, 16, 3) and v2.shape == (4, 16, 16, 3)
        assert not np.allclose(v1, v2)
        # same (frames, prime-shape) signature -> one coalesced launch
        assert any(n == 2 for n, _ in server.launch_log), server.launch_log
    finally:
        server.close()


@pytest.fixture(scope="module")
def tiny_phenaki_critic():
    """Critic-guided decode (TokenCritic re-masking scores) behind the
    server — the reference's `critic` sampling path served over HTTP."""
    from phenaki_tpu.models.maskgit import TokenCritic

    cvivit = CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    )
    cvivit_vars = cvivit.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16, 3)))
    maskgit = MaskGit(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        dim_context=TEXT_DIM,
    )
    critic = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=16, depth=1, heads=2, dim_head=16,
        has_cross_attn=True, dim_context=TEXT_DIM,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, critic=critic,
        steps=2, text_embed_dim=TEXT_DIM, max_text_len=4,
    )
    ph.init(jax.random.PRNGKey(1))
    return ph


def test_http_with_token_critic(tiny_phenaki_critic):
    """TokenCritic-guided sampling end-to-end through the HTTP front end:
    /generate (single scene) and /generate_video (chained scenes)."""
    import json
    import urllib.request

    server = PhenakiServer(
        tiny_phenaki_critic, num_frames=3, cond_scale=2.0, batch_buckets=(1,),
        max_delay_ms=1.0,
    )
    port = 18913
    t = threading.Thread(
        target=serve_http, args=(server, port), kwargs={"max_requests": 2},
        daemon=True,
    )
    t.start()
    time.sleep(0.3)
    try:
        for path, body in (
            ("/generate", {"text": "a critic-scored square"}),
            (
                "/generate_video",
                {
                    "texts": ["scene one", "scene two"],
                    "num_frames": [3, 4],
                    "prime_lengths": 1,
                },
            ),
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                payload = json.loads(r.read())
            assert "video_gif_b64" in payload, (path, payload)
    finally:
        t.join(timeout=10)
        server.close()
