"""Masking / sampling math, jit-stable (reference phenaki_pytorch.py:43-101).

The reference implements these with host-side python + eager torch (randperm
tricks, data-dependent top-k). Here everything is expressed with sorts and
comparisons against (possibly traced) counts so the whole MaskGit decode loop
can live inside one compiled `lax.scan` with no host round-trips.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def log(t: jax.Array, eps: float = 1e-10) -> jax.Array:
    return jnp.log(t + eps)


def gumbel_noise(rng: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    u = jax.random.uniform(rng, shape, dtype=dtype, minval=0.0, maxval=1.0)
    return -log(-log(u))


def gumbel_sample(
    rng: jax.Array, logits: jax.Array, temperature: jax.Array | float = 1.0
) -> jax.Array:
    """Temperature-annealed gumbel-max sampling over the last axis.

    Matches reference gumbel_sample (phenaki_pytorch.py:92-93); `temperature`
    may be a traced scalar (it anneals inside the decode scan).
    """
    logits = logits.astype(jnp.float32)
    temperature = jnp.maximum(jnp.asarray(temperature, jnp.float32), 1e-10)
    return jnp.argmax(logits / temperature + gumbel_noise(rng, logits.shape), axis=-1)


# above this many compared elements per batch row-pair matrix, fall back to
# sorting (the O(n^2) comparison matrix stops paying for itself)
_RANK_MATRIX_MAX_ELEMS = 32 * 1024 * 1024


def _ranks_descending(scores: jax.Array) -> jax.Array:
    """Per-row rank of each element when sorted descending (0 = largest);
    ties broken by ascending index (matches a stable argsort-of-argsort).

    For decode-sized rows this uses an O(n^2) comparison-matrix reduction
    instead of two sorts: rank_i = #{j: s_j > s_i} + #{j < i: s_j == s_i}.
    TPU sorts are VPU-serial and slow (two argsorts of 1152 elements cost
    ~0.35 ms per decode step); the comparison matrix is a handful of fused
    broadcast/reduce passes. Falls back to sorting for very long rows."""
    n = scores.shape[-1]
    if scores.size * n <= _RANK_MATRIX_MAX_ELEMS:
        s_i = scores[..., :, None]  # (..., n, 1) — rank target
        s_j = scores[..., None, :]  # (..., 1, n) — compared against
        idx = jnp.arange(n, dtype=jnp.int32)
        gt = s_j > s_i
        eq_before = (s_j == s_i) & (idx[None, :] < idx[:, None])
        return jnp.sum(gt | eq_before, axis=-1).astype(jnp.int32)
    order = jnp.argsort(-scores, axis=-1)
    return jnp.argsort(order, axis=-1)


def topk_mask(scores: jax.Array, k: jax.Array) -> jax.Array:
    """Boolean mask of the k largest entries per row; k may be traced (b,) or scalar.

    Replaces the reference's `scores.topk(k)` + scatter (phenaki_pytorch.py:488-489)
    with a sort-based formulation that is stable under jit with a traced k.
    """
    ranks = _ranks_descending(scores)
    k = jnp.asarray(k)
    if k.ndim == 1:
        k = k[:, None]
    return ranks < k


def get_mask_subset_with_prob(
    rng: jax.Array, mask: jax.Array, prob: jax.Array | float
) -> jax.Array:
    """Pick exactly round(prob * num_unpadded) (>= 1) positions per row to mask,
    uniformly among positions where `mask` is True.

    Pad-aware equivalent of reference get_mask_subset_with_prob
    (phenaki_pytorch.py:43-55): padded positions are never chosen.
    mask: (b, n) bool; prob: scalar or (b,).
    """
    b, n = mask.shape
    num_tokens = jnp.sum(mask, axis=-1)  # (b,)
    prob = jnp.broadcast_to(jnp.asarray(prob, jnp.float32), (b,))
    num_masked = jnp.clip(jnp.round(prob * num_tokens), 1, None)  # (b,)

    r = jax.random.uniform(rng, (b, n))
    r = jnp.where(mask, r, 2.0)  # pads rank last, never selected
    ranks = _ranks_descending(-r)  # ascending ranks of r
    return ranks < num_masked[:, None].astype(jnp.int32)


def cosine_schedule(t: jax.Array | float) -> jax.Array:
    """Mask fraction at progress t in [0, 1]: cos(t * pi/2) (reference :486, :623)."""
    return jnp.cos(jnp.asarray(t, jnp.float32) * math.pi * 0.5)


def top_k_logits(logits: jax.Array, thres: float = 0.5) -> jax.Array:
    """Keep the top (1-thres) fraction of logits, -inf elsewhere
    (reference top_k helper, phenaki_pytorch.py:95-101)."""
    num_logits = logits.shape[-1]
    k = max(int((1 - thres) * num_logits), 1)
    kth = jnp.sort(logits, axis=-1)[..., -k][..., None]
    return jnp.where(logits >= kth, logits, -jnp.inf)


def prob_mask_like(
    rng: Optional[jax.Array], shape, prob: float
) -> jax.Array:
    """Bernoulli(prob) boolean mask (reference phenaki_pytorch.py:73-79)."""
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    if prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.bernoulli(rng, prob, shape)
