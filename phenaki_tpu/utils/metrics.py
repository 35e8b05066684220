"""Reconstruction quality metrics.

The north-star quality anchor is C-ViViT reconstruction PSNR parity
(BASELINE.md); the reference itself ships no metrics — sample quality is
judged by eye from the trainers' PNG/GIF dumps (SURVEY.md §4). These are the
quantitative equivalents, jittable and batch-aware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(
    pred: jax.Array, target: jax.Array, max_val: float = 1.0
) -> jax.Array:
    """Peak signal-to-noise ratio in dB, averaged over the batch.

    pred/target: (b, ...) in [0, max_val]."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean((pred - target) ** 2, axis=axes)
    return jnp.mean(10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-10)))


def reconstruction_psnr(cvivit, cvivit_vars, videos: jax.Array) -> jax.Array:
    """PSNR of the tokenizer round trip on (b, f, H, W, c) videos in [0, 1]."""
    recon, _, _ = cvivit.apply(cvivit_vars, videos, deterministic=True)
    return psnr(jnp.clip(recon.astype(jnp.float32), 0.0, 1.0), videos)
