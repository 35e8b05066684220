"""Training-step roofline: where MaskGit (59 ms r2) and GAN step time goes.

Round-2 review #2: the decode loop got a per-component roofline; training got
none. This script times each component of the two train steps on the real
chip the same way — in-jit `lax.scan` repetition with iteration-dependent
inputs (so XLA cannot hoist the body), one device fetch per measurement to
amortize the ~28 ms tunnel RTT — and reports ms, analytic GFLOPs, and MFU
per component. Results are recorded in BASELINE.md ("Train-step roofline").

Flagship config matches bench.py: C-ViViT dim 512 @ 256x128/patch16,
MaskGit depth 6, vocab 65536, B=4, 17 frames (n=1152 tokens).

Run (TPU):  python examples/train_roofline.py [--reps 12]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument(
        "--only",
        default=None,
        help="substring filter: run only components whose name contains this"
        " (fast iteration on one section; skips the full-trainer and GAN"
        " sections unless matched)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _maskgit_fwd_flops, _vocab_proj_flops
    from phenaki_tpu.models.cvivit import CViViT
    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.models.phenaki import Phenaki
    from phenaki_tpu.utils.jit_init import jit_init

    dtype = jnp.bfloat16
    B, num_frames = 4, 17

    cvivit = CViViT(
        dim=512, codebook_size=65536, image_size=(256, 128), patch_size=16,
        temporal_patch_size=2, spatial_depth=4, temporal_depth=4,
        dim_head=64, heads=8, scan_layers=True, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    cvivit_vars = jit_init(cvivit, rng, jnp.zeros((1, 3, 256, 128, 3), dtype))
    n = cvivit.num_tokens_per_frames(num_frames)  # 1152

    maskgit = MaskGit(
        dim=512, num_tokens=65536, max_seq_len=n, depth=6, heads=8,
        dim_head=64, dim_context=768, scan_layers=True, dtype=dtype,
    )
    phenaki = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=18,
        text_embed_dim=768, max_text_len=128,
    )
    phenaki.init(jax.random.PRNGKey(1))
    jax.block_until_ready(phenaki.params)
    params = phenaki.params

    videos = jax.jit(
        lambda k: jax.random.uniform(k, (B, num_frames, 256, 128, 3), dtype)
    )(jax.random.PRNGKey(2))
    ctx = jax.jit(
        lambda k: jax.random.normal(k, (B, 128, 768), jnp.float32)
    )(jax.random.PRNGKey(3))
    ids = jax.jit(
        lambda k: jax.random.randint(k, (B, n), 0, 65536)
    )(jax.random.PRNGKey(4))
    h_emb = jax.jit(
        lambda k: jax.random.normal(k, (B, n, 512), dtype)
    )(jax.random.PRNGKey(5))
    jax.block_until_ready((videos, ctx, ids, h_emb))

    results = []

    def timed(name, body, *operands, flops=None, reps=args.reps):
        """body(rng_key, *operands) -> pytree; timed via in-jit scan over
        fresh keys. Big arrays (params, weights) MUST come in via `operands`
        — closed-over they are baked into the HLO as constants, which blows
        the remote-compile body limit and defeats buffer reuse."""
        if args.only is not None and args.only not in name:
            return None

        @jax.jit
        def many(k0, *ops):
            def step(c, k):
                out = body(k, *ops)
                # fold one scalar from EVERY output leaf into the carry: a
                # single-leaf probe lets XLA dead-code-eliminate the other
                # gradients (measured fwd+bwd "faster" than fwd)
                s = sum(
                    leaf.ravel()[0].astype(jnp.float32)
                    for leaf in jax.tree_util.tree_leaves(out)
                )
                return c + s, None

            c, _ = jax.lax.scan(
                step, jnp.float32(0), jax.random.split(k0, reps)
            )
            return c

        np.asarray(jax.device_get(many(jax.random.PRNGKey(7), *operands)))
        t0 = time.perf_counter()
        np.asarray(jax.device_get(many(jax.random.PRNGKey(8), *operands)))
        ms = (time.perf_counter() - t0) / reps * 1e3
        row = {"component": name, "ms": round(ms, 2)}
        if flops is not None:
            row["gflop"] = round(flops / 1e9, 1)
            row["mfu"] = round(flops / (ms / 1e3) / PEAK_FLOPS, 3)
        results.append(row)
        print(json.dumps(row), flush=True)
        return ms

    fwd_flops = _maskgit_fwd_flops(B, n)
    ce_flops = _vocab_proj_flops(B, n)

    # ---------------- MaskGit train-step components ---------------- #
    patch = (9, 16, 8)  # 17 frames -> 9 latent x 16 x 8 = 1152 tokens

    def cpb_bias(k, mgp):
        return maskgit.apply(
            {"params": mgp}, patch, method=MaskGit.rel_pos_bias
        )

    timed("cpb_bias_mlp", cpb_bias, params["maskgit"])

    def trunk_fwd(k, mgp):
        # same call the loss makes (embeddings out; CE fused separately;
        # CPB computed inside, as in the training forward)
        return maskgit.apply(
            {"params": mgp}, ids, video_patch_shape=patch, context=ctx,
            return_embeds=True, rngs={"cond_drop": k, "dropout": k},
        )

    timed("maskgit_trunk_fwd_b4", trunk_fwd, params["maskgit"], flops=fwd_flops)

    cot = jax.jit(lambda k: jax.random.normal(k, (B, n, 512), dtype))(
        jax.random.PRNGKey(9)
    )

    def trunk_fwd_bwd(k, mgp):
        def f(p):
            h = maskgit.apply(
                {"params": p}, ids, video_patch_shape=patch, context=ctx,
                return_embeds=True, rngs={"cond_drop": k, "dropout": k},
            )
            return jnp.sum(h.astype(jnp.float32) * cot.astype(jnp.float32))

        return jax.grad(f)(mgp)

    timed(
        "maskgit_trunk_fwd_bwd_b4", trunk_fwd_bwd, params["maskgit"],
        flops=3 * fwd_flops,
    )

    # fused CE kernel (fwd and fwd+bwd), exactly as the loss uses it
    from phenaki_tpu.ops.pallas_ce import fused_vocab_cross_entropy

    w_out = params["maskgit"]["to_logits"]["kernel"]
    b_out = params["maskgit"]["to_logits"]["bias"]

    def ce_fwd(k, w):
        labels = jax.random.randint(k, (B, n), 0, 65536)
        return fused_vocab_cross_entropy(h_emb, w, b_out, labels)

    timed("fused_ce_fwd_b4", ce_fwd, w_out, flops=ce_flops)

    def ce_fwd_bwd(k, w):
        labels = jax.random.randint(k, (B, n), 0, 65536)

        def f(h, w2, b):
            return jnp.mean(fused_vocab_cross_entropy(h, w2, b, labels))

        return jax.grad(f, argnums=(0, 1, 2))(h_emb, w, b_out)

    timed("fused_ce_fwd_bwd_b4", ce_fwd_bwd, w_out, flops=3 * ce_flops)

    def tokenize(k, cvv, v):
        return cvivit.apply(cvv, v, return_only_codebook_ids=True)

    timed("cvivit_tokenize_b4", tokenize, cvivit_vars, videos)

    # full loss fwd+bwd (= the gradient work of the train step)
    def loss_grad(k, p_all, v):
        def f(p):
            loss, _ = phenaki.loss(p, k, videos=v, text_embeds=ctx, train=True)
            return loss

        return jax.grad(f)(p_all)

    timed(
        "phenaki_loss_fwd_bwd_b4", loss_grad, params, videos,
        flops=3 * (fwd_flops + ce_flops), reps=max(4, args.reps // 2),
    )

    # optimizer update alone (adamw + global-norm clip over maskgit params)
    if args.only is None or "optimizer_update" in args.only:
        from phenaki_tpu.training.optimizer import get_optimizer

        import optax

        opt = get_optimizer(lr=3e-4)
        opt_state = jax.jit(opt.init)(params)
        grads = jax.jit(loss_grad)(jax.random.PRNGKey(11), params, videos)
        jax.block_until_ready(grads)

        def opt_update(k, g, st, p):
            updates, _ = opt.update(g, st, p)
            return optax.apply_updates(p, updates)

        timed("optimizer_update", opt_update, grads, opt_state, params)

    if args.only is not None and "FULL" not in args.only:
        print(json.dumps({"rows": results}))
        return

    # the real trainer step for the total (donated; time OUTSIDE jit-scan
    # via steady-state dispatch since state threads through)
    import tempfile

    from phenaki_tpu.training.phenaki_trainer import PhenakiTrainer

    with tempfile.TemporaryDirectory() as d:
        trainer = PhenakiTrainer(
            phenaki, batch_size=B, num_frames=num_frames, train_num_steps=1,
            num_samples=1, save_and_sample_every=10**9, results_folder=d,
            sample_texts=["bench"],
        )

        def train_once(i):
            trainer.state, metrics = trainer._train_step(
                trainer.state, (videos, ctx), jax.random.PRNGKey(100 + i),
                phenaki.cvivit_vars, fields=("videos", "text_embeds"),
            )
            return metrics["loss"]

        np.asarray(jax.device_get(train_once(0).ravel()[0]))
        outs = []
        t0 = time.perf_counter()
        for i in range(1, args.reps + 1):
            outs.append(train_once(i))
        np.asarray(jax.device_get(outs[-1].ravel()[0]))
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        trainer.checkpoints.close()
    total_flops = 3 * (fwd_flops + ce_flops)
    row = {
        "component": "FULL_maskgit_train_step_b4", "ms": round(ms, 2),
        "gflop": round(total_flops / 1e9, 1),
        "mfu": round(total_flops / (ms / 1e3) / PEAK_FLOPS, 3),
    }
    results.append(row)
    print(json.dumps(row), flush=True)

    # ---------------- GAN step components ---------------- #
    import gc

    del trainer
    gc.collect()

    from phenaki_tpu.models.cvivit import Discriminator
    from phenaki_tpu.models.cvivit_losses import (
        cvivit_discriminator_loss,
        cvivit_generator_loss,
    )

    discr = Discriminator(
        dim=64, image_size=(256, 128), attn_res_layers=(16,), dtype=dtype
    )
    discr_vars = jit_init(
        discr, jax.random.PRNGKey(12), jnp.zeros((1, 256, 128, 3), dtype)
    )
    jax.block_until_ready(discr_vars)

    def cv_fwd(k, cvv, v):
        return cvivit.apply(
            cvv, v, deterministic=True,
            method=CViViT.forward_intermediates,
            rngs={"dropout": k},
        )["recon_video"]

    timed("cvivit_ae_fwd_b4", cv_fwd, cvivit_vars, videos)

    def gen_loss_grad(k, cvp, dvars, v):
        def f(p):
            (loss, _), _ = cvivit_generator_loss(
                cvivit, {"params": p}, v, k,
                discr=discr, discr_vars=dvars,
                use_vgg_and_gan=True, deterministic=True,
                perceptual_mode="disc",
            )
            return loss

        return jax.grad(f)(cvp)

    timed(
        "gen_phase_fwd_bwd_b4_disc_perc", gen_loss_grad,
        cvivit_vars["params"], discr_vars, videos,
        reps=max(4, args.reps // 2),
    )

    def discr_loss_grad_gp(k, cvv, dp, v):
        def f(dp2):
            loss, _ = cvivit_discriminator_loss(
                cvivit, discr, cvv, {"params": dp2}, v, k,
                apply_grad_penalty=True,
            )
            return loss

        return jax.grad(f)(dp)

    timed(
        "discr_phase_fwd_bwd_b4_with_R1", discr_loss_grad_gp,
        cvivit_vars, discr_vars["params"], videos,
        reps=max(4, args.reps // 2),
    )

    def discr_loss_grad(k, cvv, dp, v):
        def f(dp2):
            loss, _ = cvivit_discriminator_loss(
                cvivit, discr, cvv, {"params": dp2}, v, k,
                apply_grad_penalty=False,
            )
            return loss

        return jax.grad(f)(dp)

    timed(
        "discr_phase_fwd_bwd_b4_no_R1", discr_loss_grad,
        cvivit_vars, discr_vars["params"], videos,
        reps=max(4, args.reps // 2),
    )

    print(json.dumps({"rows": results}))


if __name__ == "__main__":
    main()
