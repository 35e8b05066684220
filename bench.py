"""Benchmark: 17-frame 256x128 text-to-video sample, 18 decode steps.

Primary metric (BASELINE.json): sampled frames/sec/chip. North star: a full
17-frame sample in < 2 s on v5e-8, i.e. >= 8.5 frames/s/chip. The reference
publishes no numbers (SURVEY.md §6), so `vs_baseline` is measured against
that 8.5 frames/s/chip north-star target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Whole pipeline (decode scan + CFG + C-ViViT decode) runs as one jitted
program in bfloat16.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

VERBOSE = os.environ.get("BENCH_VERBOSE", "") == "1"
_T0 = time.perf_counter()


def _stage(msg: str) -> None:
    if VERBOSE:
        print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    # persistent compile cache: repeat bench runs skip the big XLA compile
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki

    dtype = jnp.bfloat16
    num_frames = 17
    steps = 18

    # canonical sample config (reference README.md:94-108 / BASELINE.json):
    # cvivit dim 512, 256x128 images, patch 16 (-> 16x8 token grid),
    # temporal patch 2 (-> 9 latent frames, 1152 tokens); maskgit depth 6.
    cvivit = CViViT(
        dim=512,
        codebook_size=65536,
        image_size=(256, 128),
        patch_size=16,
        temporal_patch_size=2,
        spatial_depth=4,
        temporal_depth=4,
        dim_head=64,
        heads=8,
        scan_layers=True,
        dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    from phenaki_tpu.utils.jit_init import jit_init

    _stage("init cvivit")
    cvivit_vars = jit_init(cvivit, rng, jnp.zeros((1, 3, 256, 128, 3), dtype))
    jax.block_until_ready(cvivit_vars)
    _stage("cvivit init done")

    n_tokens = cvivit.num_tokens_per_frames(num_frames)  # 1152
    maskgit = MaskGit(
        dim=512,
        num_tokens=65536,
        max_seq_len=n_tokens,
        depth=6,
        heads=8,
        dim_head=64,
        dim_context=768,
        scan_layers=True,
        dtype=dtype,
    )
    phenaki = Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        steps=steps,
        text_embed_dim=768,
        max_text_len=128,
    )
    phenaki.init(jax.random.PRNGKey(1))
    jax.block_until_ready(phenaki.params)
    _stage("phenaki init done")

    text_embeds = np.random.randn(1, 50, 768).astype(np.float32)

    def run(seed):
        return phenaki.sample(
            num_frames=num_frames,
            text_embeds=text_embeds,
            cond_scale=5.0,
            rng=jax.random.PRNGKey(seed),
        )

    # warmup/compile
    _stage("compiling sample program")
    video = run(0)
    # NOTE: through the tunneled TPU backend, block_until_ready returns before
    # remote execution finishes — fetching output bytes is the only honest
    # completion barrier. A SCALAR fetch suffices (no output byte is readable
    # until the whole program completes) and avoids billing the tunnel's slow
    # ~30 MB/s HTTP transfer of the 3.3 MB video against the chip: on real
    # hardware the video either stays on-device for postprocessing or crosses
    # PCIe in ~1 ms.
    def fetch_barrier(v):
        np.asarray(jax.device_get(v[0, 0, 0, 0, 0]))

    fetch_barrier(video)
    _stage("sample program compiled + first run done")

    # median of per-iteration timings: the tunneled backend adds +-15%
    # dispatch jitter that a mean over few iterations inherits
    iters = 10
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        video = run(i)
        fetch_barrier(video)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    frames_per_sec = num_frames / dt
    target = 17 / 2.0  # north star: 17 frames in < 2 s per chip
    result = {
        "metric": "sampled_frames_per_sec_per_chip_17f_256x128_18steps",
        "value": round(frames_per_sec, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(frames_per_sec / target, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
