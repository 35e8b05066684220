"""End-to-end smoke drive: sample → determinism → make_video → native GIF
round-trip → training loss, on a small config (the verify recipe's E2E arm).

Covers the reference's user journey end to end (reference README.md:94-188:
train tokenizer → maskgit → sample/make_video) on whatever backend JAX
picks — the real TPU chip when available, CPU otherwise (the flash kernel
only routes on TPU; off-TPU the XLA attention path runs).

Run:  python examples/e2e_smoke.py
Exit code 0 and a final "E2E: ALL PASS" line mean every stage passed.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_T0 = time.perf_counter()


def stage(msg: str) -> None:
    print(f"[e2e +{time.perf_counter() - _T0:6.1f}s] {msg}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_bench_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from phenaki_tpu import CViViT, MaskGit, Phenaki
    from phenaki_tpu.data.codecs import video_tensor_to_gif
    from phenaki_tpu.data.datasets import DataLoader, VideoDataset
    from phenaki_tpu.models.phenaki import make_video

    stage(f"backend = {jax.default_backend()}")

    cvivit = CViViT(
        dim=128, codebook_size=8192, image_size=(64, 64), patch_size=8,
        temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
        dim_head=32, heads=4,
    )
    cvivit_vars = cvivit.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64, 3))
    )
    stage("cvivit init ok")
    # max_seq_len 384 covers the primed scene: prime 3f (2 latent frames,
    # 128 tokens) + scene 8f (4 latent frames, 256 tokens)
    maskgit = MaskGit(
        num_tokens=8192, max_seq_len=384, dim=128, depth=2,
        dim_context=768, heads=4, dim_head=32,
    )
    ph = Phenaki(
        cvivit=cvivit, maskgit=maskgit, cvivit_vars=cvivit_vars,
        steps=6, text_embed_dim=768,
    )
    ph.init(jax.random.PRNGKey(1))
    stage("phenaki init ok")

    temb = jax.random.normal(jax.random.PRNGKey(3), (1, 12, 768), jnp.float32)
    vid = np.asarray(
        ph.sample(num_frames=9, text_embeds=temb, rng=jax.random.PRNGKey(7))
    )
    assert vid.shape == (1, 9, 64, 64, 3), vid.shape
    stage(
        f"sample ok {vid.shape} range"
        f" [{float(vid.min()):.2f}, {float(vid.max()):.2f}]"
    )

    vid2 = np.asarray(
        ph.sample(num_frames=9, text_embeds=temb, rng=jax.random.PRNGKey(7))
    )
    assert np.array_equal(vid, vid2), "determinism FAIL"
    stage("determinism ok")

    entire, scenes = make_video(
        ph, texts=["a cat", "it jumps"], num_frames=(9, 8), prime_lengths=3,
        rng=jax.random.PRNGKey(11),
    )
    entire = np.asarray(entire)
    assert entire.shape[1] == 17, entire.shape
    stage(f"make_video ok {entire.shape}")

    # native C++ GIF codec round trip; an untrained model samples outside
    # [0,1], so compare against the clipped tensor the codec actually wrote
    d = tempfile.mkdtemp()
    clipped = np.clip(vid[0], 0, 1)
    video_tensor_to_gif(clipped, os.path.join(d, "v.gif"))
    ds = VideoDataset(d, image_size=64, num_frames=9)
    back = np.asarray(next(iter(DataLoader(ds, batch_size=1))))
    b = back[0] if back.ndim == 5 else back
    err = float(np.abs(b[:9] - clipped).mean())
    assert err < 0.08, err
    stage(f"gif roundtrip ok (mean abs err {err:.4f})")

    videos = jax.random.uniform(jax.random.PRNGKey(5), (2, 9, 64, 64, 3))
    tb = jax.random.normal(jax.random.PRNGKey(6), (2, 12, 768), jnp.float32)
    loss, _aux = ph.loss(
        ph.params, jax.random.PRNGKey(8), videos=videos, text_embeds=tb
    )
    lv = float(loss)
    assert np.isfinite(lv), lv
    stage(f"loss ok ({lv:.4f})")

    print("E2E: ALL PASS", flush=True)


if __name__ == "__main__":
    main()
