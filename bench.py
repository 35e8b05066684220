"""Benchmark harness.

Default mode prints ONE JSON line for the driver — the primary metric
(BASELINE.json): 17-frame 256x128 text-to-video sample, 18 decode steps,
frames/s/chip. North star: a full 17-frame sample in < 2 s on v5e-8, i.e.
>= 8.5 frames/s/chip. The reference publishes no numbers (SURVEY.md §6), so
`vs_baseline` measures against that north-star target.

`--full` regenerates EVERY BASELINE.md row as one JSON line each (tokenize
throughput, MaskGit train step, critic sampling, batched sampling, C-ViViT
GAN trainer step), so the table is traceable to one command:

    python bench.py --full

Measurement notes:
  * inputs are DEVICE-RESIDENT (generated on device once): through the
    tunneled backend, host->device transfer of a 200 MB pixel batch takes
    seconds and would swamp any step time; real deployments stream batches
    asynchronously so steady-state step time excludes transfer;
  * completion barrier = fetching one output SCALAR (block_until_ready
    returns early through the tunnel; no output byte is readable until the
    whole program finishes);
  * throughput rows use steady-state timing (dispatch N back-to-back,
    barrier once on the last output — in-order device queue); the latency
    row uses a per-call barrier and so includes one ~28 ms tunnel round
    trip per request.
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


def _fetch_scalar(x) -> None:
    """Honest completion barrier: read one element of a device array.

    Accepts any pytree (e.g. a gradient dict) — all outputs of one jitted
    executable complete together, so reading one leaf's first element
    blocks until the whole program (including the rest of the backward)
    has finished."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _time_median(fn, iters: int = 8):
    """fn(i) -> device array; returns median seconds/call (after warmup).

    Per-call completion barrier: measures request LATENCY, including one
    host<->device round trip per call (~30 ms over the axon tunnel)."""
    _fetch_scalar(fn(0))  # compile + warm
    times = []
    for i in range(1, iters + 1):
        t0 = time.perf_counter()
        out = fn(i)
        _fetch_scalar(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _time_steady(fn, iters: int = 8):
    """fn(i) -> device array; returns steady-state seconds/call.

    Dispatches all calls back-to-back and barriers once on the LAST output
    (device queues execute in order, so the last completing means all
    completed). This is the sustained-throughput number: the single
    host<->device round trip is amortized over `iters`, the way a serving
    deployment streams requests without a sync per sample."""
    _fetch_scalar(fn(0))  # compile + warm
    outs = []
    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        outs.append(fn(i))
    _fetch_scalar(outs[-1])
    dt = (time.perf_counter() - t0) / iters
    del outs
    return dt


def _emit(metric: str, value: float, unit: str, vs_baseline=None, mfu=None) -> None:
    row = {"metric": metric, "value": round(value, 3), "unit": unit}
    if vs_baseline is not None:
        row["vs_baseline"] = round(vs_baseline, 3)
    if mfu is not None:
        row["mfu"] = round(mfu, 3)
    print(json.dumps(row), flush=True)


# ---------------------------------------------------------------------- #
# MFU accounting (VERDICT r2 #1/#2: an MFU column on every perf row)      #
# ---------------------------------------------------------------------- #

# v5e bf16 MXU peak; override for other chips (v4: 275e12, v5p: 459e12)
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))


def _mfu(flops: float, seconds: float) -> float:
    return flops / seconds / PEAK_FLOPS


def _maskgit_fwd_flops(
    b, n, d=512, depth=6, heads=8, dh=64, m_ctx=50, d_ctx=768
) -> float:
    """Analytic matmul FLOPs of one MaskGit/TokenCritic trunk forward
    (2 FLOPs per MAC). Counts projections, attention score/value matmuls,
    cross-attention, and the GEGLU FF; omits norms/embeds/PEG (<2%), so MFU
    derived from this is a slight UNDERestimate."""
    inner = heads * dh
    f = 0.0
    f += 2 * b * n * d * inner * 3 + 2 * b * n * inner * d  # self qkv + out
    f += 4 * b * heads * n * n * dh  # qk^T and p@v
    f += (  # cross-attention: q, k/v from context, out, score/value matmuls
        2 * b * n * d * inner
        + 4 * b * m_ctx * d_ctx * inner
        + 2 * b * n * inner * d
        + 4 * b * heads * n * m_ctx * dh
    )
    ff = int(4 * d * 2 / 3)
    f += 4 * b * n * d * ff + 2 * b * n * ff * d  # GEGLU: 2 in-projs + out
    return f * depth


def _vocab_proj_flops(b, n, d=512, v=65536) -> float:
    return 2.0 * b * n * d * v


def _jit_cost_flops(jitted, *args, **kwargs):
    """XLA's own FLOP count for a jitted callable, or None if the backend
    doesn't expose cost analysis."""
    try:
        ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


_PROBE_SRC = """
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128), jnp.bfloat16)
np.asarray(jax.device_get((x @ x).sum()))
"""


def _wait_for_backend(
    max_wait_s: float = float(os.environ.get("BENCH_MAX_BACKEND_WAIT", 1200.0)),
) -> None:
    """Wait out a wedged tunnel grant before touching the device.

    A previously killed in-flight client can wedge the axon grant
    server-side for tens of minutes; a jax client launched during the
    wedge hangs inside backend init, where no in-process timeout can
    reach it. So probe from a KILL-ABLE subprocess with backoff and only
    let this process initialize its backend once a probe succeeds. Costs
    one ~10 s probe on a healthy backend; on an unrecovered wedge, gives
    up after `max_wait_s` and proceeds (the real run then surfaces the
    hang to the caller's own timeout)."""
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PROBE_SRC],
                timeout=90,
                capture_output=True,
            )
            if r.returncode == 0:
                if attempt > 1:
                    _stage(f"backend recovered on probe {attempt}")
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(
                f"[bench] backend probe still failing after {attempt} tries /"
                f" {max_wait_s:.0f}s — proceeding anyway",
                file=sys.stderr,
                flush=True,
            )
            return
        print(
            f"[bench] backend probe {attempt} failed (wedged grant?); retrying",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(min(30.0 * attempt, 120.0))


def main():
    full = "--full" in sys.argv

    _wait_for_backend()

    import jax

    # persistent compile cache: repeat bench runs skip the big XLA compile
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.utils.jit_init import jit_init

    dtype = jnp.bfloat16
    num_frames = 17
    steps = 18

    # canonical sample config (reference README.md:94-108 / BASELINE.json):
    # cvivit dim 512, 256x128 images, patch 16 (-> 16x8 token grid),
    # temporal patch 2 (-> 9 latent frames, 1152 tokens); maskgit depth 6.
    # Built from the package presets so the benchmark IS the preset.
    from phenaki_tpu.presets import flagship_cvivit, flagship_maskgit

    cvivit = flagship_cvivit(dtype=dtype)
    rng = jax.random.PRNGKey(0)

    _stage("init cvivit")
    cvivit_vars = jit_init(cvivit, rng, jnp.zeros((1, 3, 256, 128, 3), dtype))
    jax.block_until_ready(cvivit_vars)
    _stage("cvivit init done")

    n_tokens = cvivit.num_tokens_per_frames(num_frames)  # 1152
    maskgit = flagship_maskgit(max_seq_len=n_tokens, dtype=dtype)
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

    # ------------------------------------------------------------------ #
    # 1. primary: single-stream text-to-video sampling                    #
    # ------------------------------------------------------------------ #
    _stage("compiling sample program")
    dt = _time_steady(
        lambda i: phenaki.sample(
            num_frames=num_frames,
            text_embeds=text_embeds,
            cond_scale=5.0,
            rng=jax.random.PRNGKey(i),
        ),
        iters=10,
    )
    _stage("sampling benched")
    target = 17 / 2.0  # north star: 17 frames in < 2 s per chip
    # analytic FLOPs per sample: 18 decode steps x (CFG-stacked trunk fwd at
    # 2b + fused vocab projection at b); C-ViViT decode (~0.1 TF) omitted
    flops_sample_b1 = steps * (
        _maskgit_fwd_flops(2, n_tokens) + _vocab_proj_flops(1, n_tokens)
    )
    _emit(
        "sampled_frames_per_sec_per_chip_17f_256x128_18steps",
        num_frames / dt,
        "frames/s/chip",
        vs_baseline=(num_frames / dt) / target,
        mfu=_mfu(flops_sample_b1, dt),
    )
    if full:
        # single-request latency (includes one tunnel round trip per call)
        dt_lat = _time_median(
            lambda i: phenaki.sample(
                num_frames=num_frames,
                text_embeds=text_embeds,
                cond_scale=5.0,
                rng=jax.random.PRNGKey(1000 + i),
            ),
            iters=6,
        )
        _emit("sample_latency_ms_17f_256x128_18steps", dt_lat * 1e3, "ms")
    if not full:
        return

    # ------------------------------------------------------------------ #
    # 1b. d_head=128 TPU-flagship MaskGit (round-3 review #6): same param  #
    #     budget (4 heads x 128 = 8 x 64) but the QK contraction fills     #
    #     the MXU's full 128 depth. Reference default stays dim_head=64    #
    #     (cvivit.py:238); this row records what the TPU-shaped config     #
    #     actually buys for sampling and training.                        #
    # ------------------------------------------------------------------ #
    _stage("d_head=128 flagship bench")
    maskgit128 = flagship_maskgit(tpu_native=True, max_seq_len=n_tokens, dtype=dtype)
    phenaki128 = Phenaki(
        maskgit=maskgit128,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        steps=steps,
        text_embed_dim=768,
        max_text_len=128,
    )
    phenaki128.init(jax.random.PRNGKey(3))
    jax.block_until_ready(phenaki128.params)
    dt128 = _time_steady(
        lambda i: phenaki128.sample(
            num_frames=num_frames,
            text_embeds=text_embeds,
            cond_scale=5.0,
            rng=jax.random.PRNGKey(i),
        ),
        iters=10,
    )
    flops_sample128 = steps * (
        _maskgit_fwd_flops(2, n_tokens, heads=4, dh=128)
        + _vocab_proj_flops(1, n_tokens)
    )
    _emit(
        "sampled_frames_per_sec_dhead128_17f_256x128_18steps",
        num_frames / dt128,
        "frames/s/chip",
        vs_baseline=(num_frames / dt128) / target,
        mfu=_mfu(flops_sample128, dt128),
    )

    # d_head=128 train-step gradient work (loss fwd+bwd, jitted)
    videos_tr128 = jax.jit(
        lambda k: jax.random.uniform(k, (4, num_frames, 256, 128, 3), dtype)
    )(jax.random.PRNGKey(4))
    ctx_tr128 = jax.jit(
        lambda k: jax.random.normal(k, (4, 128, 768), jnp.float32)
    )(jax.random.PRNGKey(5))
    jax.block_until_ready((videos_tr128, ctx_tr128))

    @jax.jit
    def loss_grad128(p, k, v, c):
        def f(p2):
            loss, _ = phenaki128.loss(
                p2, k, videos=v, text_embeds=c, train=True,
                cvivit_vars=cvivit_vars,
            )
            return loss

        return jax.grad(f)(p)

    g = loss_grad128(
        phenaki128.params, jax.random.PRNGKey(0), videos_tr128, ctx_tr128
    )
    jax.block_until_ready(g)
    dt128t = _time_steady(
        lambda i: loss_grad128(
            phenaki128.params, jax.random.PRNGKey(i), videos_tr128, ctx_tr128
        ),
        iters=6,
    )
    train_flops128 = 3 * (
        _maskgit_fwd_flops(4, n_tokens, heads=4, dh=128)
        + _vocab_proj_flops(4, n_tokens)
    )
    _emit(
        "maskgit_loss_fwd_bwd_ms_dhead128_b4",
        dt128t * 1e3,
        "ms",
        mfu=_mfu(train_flops128, dt128t),
    )
    del phenaki128, maskgit128, g

    # ------------------------------------------------------------------ #
    # 2. C-ViViT tokenize throughput (B=32, device-resident pixels)       #
    # ------------------------------------------------------------------ #
    _stage("tokenize bench")
    B_tok = 32
    videos_tok = jax.jit(
        lambda k: jax.random.uniform(
            k, (B_tok, num_frames, 256, 128, 3), dtype
        )
    )(jax.random.PRNGKey(2))
    jax.block_until_ready(videos_tok)
    tokenize = jax.jit(
        lambda v: cvivit.apply(cvivit_vars, v, return_only_codebook_ids=True)
    )
    dt = _time_steady(lambda i: tokenize(videos_tok), iters=8)
    tok_flops = _jit_cost_flops(tokenize, videos_tok)
    _emit(
        "cvivit_tokenize_vids_per_sec_b32_17f_256x128",
        B_tok / dt,
        "vids/s/chip",
        mfu=_mfu(tok_flops, dt) if tok_flops else None,
    )

    # ------------------------------------------------------------------ #
    # 3. C-ViViT GAN trainer step (gen+discr phases, VGG perceptual,      #
    #    adaptive weight, EMA — via the trainer's jitted steps). Runs     #
    #    BEFORE the flagship MaskGit sections: a GAN training deployment  #
    #    doesn't share its chip with a resident 65536-vocab sampler, and  #
    #    HBM fragmentation from those sections distorts this row          #
    # ------------------------------------------------------------------ #
    _stage("gan trainer step bench")
    import gc
    import tempfile

    from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

    B_tr = 4
    with tempfile.TemporaryDirectory() as d:
        gan_trainer = CViViTTrainer(
            cvivit,
            num_train_steps=1,
            batch_size=B_tr,
            num_frames=num_frames,
            use_vgg_and_gan=True,
            discr_base_dim=64,
            discr_attn_res_layers=(16,),
            save_results_every=10**9,
            save_model_every=10**9,
            results_folder=d,
            use_ema=True,
        )
        batch_gan = jax.jit(
            lambda k: jax.random.uniform(
                k, (B_tr, num_frames, 256, 128, 3), dtype
            )
        )(jax.random.PRNGKey(6))
        jax.block_until_ready(batch_gan)

        def gan_once(i):
            k1, k2 = jax.random.split(jax.random.PRNGKey(200 + i))
            gan_trainer.state, m1 = gan_trainer._gen_step(
                gan_trainer.state, gan_trainer.vgg_vars, batch_gan, k1
            )
            # the trainer applies the R1 penalty every 4th step
            # (apply_grad_penalty_every=4) — time the same mix
            gan_trainer.state, m2 = gan_trainer._discr_step(
                gan_trainer.state, batch_gan, k2, apply_grad_penalty=(i % 4 == 0)
            )
            return m2["discr_loss"]

        _fetch_scalar(gan_once(4))  # compile+warm the no-penalty variant too
        dt = _time_steady(gan_once, iters=8)
        # XLA's FLOP count for both phases (gen + discr with the R1 branch;
        # the traced-flag cond means one executable covers both mixes)
        k1, k2 = jax.random.split(jax.random.PRNGKey(201))
        gan_flops = None
        g1 = _jit_cost_flops(
            gan_trainer._gen_step, gan_trainer.state, gan_trainer.vgg_vars,
            batch_gan, k1,
        )
        g2 = _jit_cost_flops(
            gan_trainer._discr_step, gan_trainer.state, batch_gan, k2,
            apply_grad_penalty=jnp.asarray(True),
        )
        if g1 and g2:
            gan_flops = g1 + g2
        gan_trainer.checkpoints.close()
        del gan_trainer, gan_once, batch_gan
    gc.collect()
    _emit(
        "cvivit_gan_train_step_vids_per_sec_b4_17f_256x128",
        B_tr / dt,
        "vids/s/chip",
        mfu=_mfu(gan_flops, dt) if gan_flops else None,
    )

    # ------------------------------------------------------------------ #
    # 4. MaskGit train step (B=4, full fwd+bwd+Adam via the trainer's     #
    #    jitted step)                                                     #
    # ------------------------------------------------------------------ #
    _stage("maskgit train step bench")
    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    with tempfile.TemporaryDirectory() as d:
        trainer = PhenakiTrainer(
            phenaki,
            batch_size=B_tr,
            num_frames=num_frames,
            train_num_steps=1,
            num_samples=1,
            save_and_sample_every=10**9,
            results_folder=d,
            sample_texts=["bench"],
        )
        videos_tr = jax.jit(
            lambda k: jax.random.uniform(
                k, (B_tr, num_frames, 256, 128, 3), dtype
            )
        )(jax.random.PRNGKey(3))
        ctx_tr = jax.jit(
            lambda k: jax.random.normal(k, (B_tr, 128, 768), jnp.float32)
        )(jax.random.PRNGKey(4))
        jax.block_until_ready((videos_tr, ctx_tr))

        def train_once(i):
            trainer.state, metrics = trainer._train_step(
                trainer.state,
                (videos_tr, ctx_tr),
                jax.random.PRNGKey(100 + i),
                phenaki.cvivit_vars,
                fields=("videos", "text_embeds"),
            )
            return metrics["loss"]

        dt = _time_steady(train_once, iters=6)
        # XLA count if available; else analytic fwd+bwd (~3x fwd) + fused CE
        # (fwd + dW + dh ~ 3x the projection)
        train_flops = _jit_cost_flops(
            trainer._train_step, trainer.state, (videos_tr, ctx_tr),
            jax.random.PRNGKey(100), phenaki.cvivit_vars,
            fields=("videos", "text_embeds"),
        )
        if not train_flops:
            train_flops = 3 * (
                _maskgit_fwd_flops(B_tr, n_tokens)
                + _vocab_proj_flops(B_tr, n_tokens)
            )
        trainer.checkpoints.close()
        # release the trainer's device state (params + Adam moments +
        # MultiSteps ~2-3 GB at the 65536-vocab flagship) before the later
        # sections — leaked sections overcommit HBM and the GAN trainer
        # step collapses ~30x from allocator thrashing
        del trainer, train_once
    gc.collect()
    _emit(
        "maskgit_train_step_vids_per_sec_b4_17f_256x128",
        B_tr / dt,
        "vids/s/chip",
        mfu=_mfu(train_flops, dt),
    )

    # ------------------------------------------------------------------ #
    # 5. sampling with TokenCritic (extra critic CFG forward per step)    #
    # ------------------------------------------------------------------ #
    _stage("critic sampling bench")
    from phenaki_tpu.presets import flagship_token_critic

    critic = flagship_token_critic(max_seq_len=n_tokens, dtype=dtype)
    phenaki_c = Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        critic=critic,
        steps=steps,
        text_embed_dim=768,
        max_text_len=128,
    )
    phenaki_c.init(jax.random.PRNGKey(5))
    # share the trained maskgit weights; only the critic is new
    phenaki_c.params["maskgit"] = phenaki.params["maskgit"]
    jax.block_until_ready(phenaki_c.params)
    dt = _time_steady(
        lambda i: phenaki_c.sample(
            num_frames=num_frames,
            text_embeds=text_embeds,
            cond_scale=5.0,
            rng=jax.random.PRNGKey(i),
        ),
        iters=6,
    )
    # per decode step the critic adds its own CFG-stacked trunk forward
    critic_flops = flops_sample_b1 + steps * _maskgit_fwd_flops(2, n_tokens)
    _emit(
        "sampled_frames_per_sec_per_chip_with_token_critic",
        num_frames / dt,
        "frames/s/chip",
        vs_baseline=(num_frames / dt) / target,
        mfu=_mfu(critic_flops, dt),
    )

    # ------------------------------------------------------------------ #
    # 6. batched sampling throughput (serving mode, batch 8)              #
    # ------------------------------------------------------------------ #
    _stage("batched sampling bench")
    B_s = 8
    text_embeds_b = np.random.randn(B_s, 50, 768).astype(np.float32)
    dt = _time_steady(
        lambda i: phenaki.sample(
            num_frames=num_frames,
            text_embeds=text_embeds_b,
            cond_scale=5.0,
            rng=jax.random.PRNGKey(i),
        ),
        iters=6,
    )
    del phenaki_c, critic
    gc.collect()
    flops_sample_b8 = steps * (
        _maskgit_fwd_flops(2 * B_s, n_tokens) + _vocab_proj_flops(B_s, n_tokens)
    )
    _emit(
        "batched_sampling_frames_per_sec_per_chip_b8",
        B_s * num_frames / dt,
        "frames/s/chip",
        vs_baseline=(B_s * num_frames / dt) / target,
        mfu=_mfu(flops_sample_b8, dt),
    )
    _emit("batched_sampling_videos_per_sec_b8", B_s / dt, "videos/s/chip")

    # ------------------------------------------------------------------ #
    # 7. serving throughput (PhenakiServer dynamic batching: concurrent   #
    #    requests coalesced into bucket-8 launches)                       #
    # ------------------------------------------------------------------ #
    _stage("serving bench")
    from phenaki_tpu.serving import PhenakiServer

    server = PhenakiServer(
        phenaki,
        num_frames=num_frames,
        cond_scale=5.0,
        batch_buckets=(1, 8),  # programs already compiled by sections 1/6
        max_delay_ms=40.0,
        seed=0,
    )
    n_req = 24
    reqs = np.random.RandomState(9).randn(n_req, 50, 768).astype(np.float32)
    # warm the server path (bucket-1 program)
    server.submit(text_embeds=reqs[0]).result(timeout=600)
    t0 = time.perf_counter()
    futures = [server.submit(text_embeds=reqs[i]) for i in range(n_req)]
    for f in futures:
        f.result(timeout=600)
    dt_total = time.perf_counter() - t0
    server.close()
    _emit(
        "serving_throughput_videos_per_sec",
        n_req / dt_total,
        "videos/s/chip",
    )
    _emit(
        "serving_throughput_frames_per_sec",
        n_req * num_frames / dt_total,
        "frames/s/chip",
        vs_baseline=(n_req * num_frames / dt_total) / target,
    )
    _stage("full bench done")


if __name__ == "__main__":
    main()
