"""End-to-end system demonstration on synthetic data.

Trains the full Phenaki pipeline from scratch on a toy text-to-video task —
a bright square moving in a caption-given direction — and verifies the system
learns end to end:

  1. C-ViViT tokenizer (recon-only) -> reconstruction PSNR
  2. MaskGit on (tokens, caption) pairs -> masked-CE drop
  3. Text-conditioned sampling with CFG -> does the generated video's motion
     match the caption? (measured by tracking the brightest blob)

Runs in a few minutes on one TPU chip. This is the correctness check unit
tests can't give: tokenizer, transformer, conditioning, CFG, and the fused
sampling kernels all have to work together for direction accuracy to beat
chance (25%).

Usage: python examples/train_moving_shapes.py [--steps1 N] [--steps2 N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.models.cvivit_losses import cvivit_generator_loss
from phenaki_tpu.models.maskgit import MaskGit
from phenaki_tpu.models.phenaki import Phenaki
from phenaki_tpu.training.optimizer import get_optimizer
from phenaki_tpu.utils.jit_init import jit_init
from phenaki_tpu.utils.metrics import psnr

DIRECTIONS = ["right", "left", "down", "up"]
DELTAS = {"right": (0, 2), "left": (0, -2), "down": (2, 0), "up": (-2, 0)}
SIZE = 16
FRAMES = 5


def make_batch(rng: np.random.RandomState, batch: int):
    """(videos (b, 5, 16, 16, 3), direction indices (b,))."""
    vids = np.zeros((batch, FRAMES, SIZE, SIZE, 3), np.float32)
    dirs = rng.randint(0, 4, batch)
    for i in range(batch):
        dy, dx = DELTAS[DIRECTIONS[dirs[i]]]
        y, x = rng.randint(4, SIZE - 7, 2)
        color = 0.5 + 0.5 * rng.rand(3)
        for f in range(FRAMES):
            yy, xx = y + dy * f, x + dx * f
            yy, xx = np.clip(yy, 0, SIZE - 3), np.clip(xx, 0, SIZE - 3)
            vids[i, f, yy : yy + 3, xx : xx + 3] = color
    return vids, dirs


def direction_of(video: np.ndarray) -> str:
    """Dominant motion of the brightest blob across frames."""
    centers = []
    for f in video:
        lum = f.sum(-1)
        idx = np.unravel_index(np.argmax(lum), lum.shape)
        centers.append(idx)
    centers = np.asarray(centers, np.float32)
    dy, dx = (centers[-1] - centers[0]) / max(len(centers) - 1, 1)
    if abs(dx) >= abs(dy):
        return "right" if dx > 0 else "left"
    return "down" if dy > 0 else "up"


# one-hot "text" embeddings per direction word (stands in for T5; the point
# is conditioning, not language)
TEXT_DIM = 16


def embed_direction(dirs: np.ndarray) -> np.ndarray:
    emb = np.zeros((len(dirs), 4, TEXT_DIM), np.float32)
    for i, d in enumerate(dirs):
        emb[i, :, d] = 1.0
        emb[i, :, 8:] = 0.1  # keep rows non-zero so the text mask covers them
    return emb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=600, help="tokenizer steps")
    ap.add_argument("--steps2", type=int, default=800, help="maskgit steps")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    rng_np = np.random.RandomState(0)

    # ---- stage 1: tokenizer ---- #
    cvivit = CViViT(
        dim=64, codebook_size=256, image_size=SIZE, patch_size=4,
        temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
        dim_head=32, heads=2,
    )
    v0 = jit_init(cvivit, jax.random.PRNGKey(0), jnp.zeros((1, FRAMES, SIZE, SIZE, 3)))
    params = v0["params"]
    opt = get_optimizer(lr=2e-3, wd=0.0, max_grad_norm=1.0)
    opt_state = opt.init(params)

    @jax.jit
    def tok_step(params, opt_state, videos, rng):
        def loss_fn(p):
            (loss, aux), _ = cvivit_generator_loss(
                cvivit, {"params": p}, videos, rng, use_vgg_and_gan=False
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux["recon_loss"]

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for step in range(args.steps1):
        videos, _ = make_batch(rng_np, args.batch)
        key, sub = jax.random.split(key)
        params, opt_state, recon = tok_step(params, opt_state, jnp.asarray(videos), sub)
        if step % 200 == 0:
            print(f"[tok {step}] recon_loss={float(recon):.4f}", flush=True)
    cvivit_vars = {"params": params}

    test_videos, _ = make_batch(rng_np, 32)
    recon, _, _ = jax.jit(
        lambda v, x: cvivit.apply(v, x, deterministic=True)
    )(cvivit_vars, jnp.asarray(test_videos))
    p = float(psnr(jnp.clip(recon, 0, 1), jnp.asarray(test_videos)))
    print(f"tokenizer PSNR after {args.steps1} steps: {p:.2f} dB "
          f"({time.time()-t0:.0f}s)", flush=True)

    # ---- stage 2: maskgit ---- #
    maskgit = MaskGit(
        dim=64, num_tokens=256, max_seq_len=cvivit.num_tokens_per_frames(FRAMES),
        depth=2, heads=2, dim_head=32, dim_context=TEXT_DIM,
    )
    ph = Phenaki(
        maskgit=maskgit, cvivit=cvivit, cvivit_vars=cvivit_vars, steps=8,
        text_embed_dim=TEXT_DIM, max_text_len=4, cond_drop_prob=0.25,
    )
    mg_params = ph.init(jax.random.PRNGKey(2))
    opt2 = get_optimizer(lr=2e-3, wd=0.0, max_grad_norm=1.0)
    opt2_state = opt2.init(mg_params)

    @jax.jit
    def mg_step(params, opt_state, cvv, videos, text, rng):
        def loss_fn(p):
            return ph.loss(p, rng, videos=videos, text_embeds=text, cvivit_vars=cvv)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt2.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.time()
    for step in range(args.steps2):
        videos, dirs = make_batch(rng_np, args.batch)
        key, sub = jax.random.split(key)
        mg_params, opt2_state, ce = mg_step(
            mg_params, opt2_state, cvivit_vars, jnp.asarray(videos),
            jnp.asarray(embed_direction(dirs)), sub,
        )
        if step % 200 == 0:
            print(f"[maskgit {step}] masked_ce={float(ce):.4f}", flush=True)
    ph.params = mg_params
    print(f"maskgit trained ({time.time()-t0:.0f}s)", flush=True)

    # ---- stage 3: conditioned sampling ---- #
    n_per_dir = 8
    correct = 0
    for d_idx, d in enumerate(DIRECTIONS):
        text = embed_direction(np.full(n_per_dir, d_idx))
        key, sub = jax.random.split(key)
        vids = ph.sample(
            num_frames=FRAMES, text_embeds=text, cond_scale=3.0, rng=sub
        )
        vids = np.clip(np.asarray(jax.device_get(vids), np.float32), 0, 1)
        got = [direction_of(v) for v in vids]
        hits = sum(g == d for g in got)
        correct += hits
        print(f"caption '{d}': sampled motions {got} ({hits}/{n_per_dir})", flush=True)

    total = n_per_dir * 4
    acc = correct / total
    print(f"\ndirection accuracy: {correct}/{total} = {acc:.0%} (chance 25%)", flush=True)
    print("SYSTEM E2E:", "PASS" if (p > 25.0 and acc > 0.5) else "WEAK", flush=True)


if __name__ == "__main__":
    main()
