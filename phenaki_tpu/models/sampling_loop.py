"""MaskGit iterative parallel decoding as ONE jitted lax.scan.

Reference: the 18-step loop in Phenaki.sample (phenaki_pytorch.py:478-550)
runs host-side python per step — 2 MaskGit forwards (CFG) plus 2 critic
forwards per step, with top-k/masking/gumbel on host-dispatched kernels. Here
the whole loop is a single compiled program:

  * the step loop is a `lax.scan` carrying (token ids, scores, rng key) — no
    host round-trips;
  * CFG's cond/null pair is stacked on the batch axis -> ONE forward at 2x
    batch per step (MXU-friendly) instead of two launches;
  * top-k re-masking is sort-based (jit-stable with the traced per-step k);
  * critic scores are computed under `lax.cond` so the last step skips the
    critic forward exactly like the reference (:511).

Prime tokens are a static-length prefix carried outside the scan state
(phenaki_pytorch.py:493,503-504).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from phenaki_tpu.ops.pallas_sampling import (
    gumbel_sample_with_score,
    project_gumbel_sample_with_score,
    use_fused_sampling,
)
from phenaki_tpu.ops.sampling import gumbel_sample, topk_mask

NEG_SCORE = -1e4


def maskgit_sample_loop(
    logits_fn: Optional[Callable[[jax.Array], jax.Array]],
    *,
    rng: jax.Array,
    batch: int,
    num_tokens_seq: int,
    mask_id: int,
    steps: int = 18,
    starting_temperature: float = 0.9,
    prime_ids: Optional[jax.Array] = None,  # (b, P) int32
    critic_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    noise_K: float = 1.0,
    critic_noise_anneal_schedule: str = "decay",
    stacked_cfg_scale: Optional[float] = None,
    embeds_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    vocab_proj: Optional[Tuple[jax.Array, Optional[jax.Array]]] = None,
) -> jax.Array:
    """Run the iterative decode; returns final token ids (b, num_tokens_seq).

    `logits_fn(ids)`: (b, P+n) ids -> (b, P+n, vocab) CFG-combined logits —
    or, when `stacked_cfg_scale` is set, the STACKED (2b, P+n, vocab) cond/null
    logits whose CFG combine is fused into the sampling kernel.
    `critic_fn(ids)`: (b, P+n) ids -> (b, P+n) critic scores.
    Both close over params/context; they are traced once inside the scan.

    Fastest path: `embeds_fn(ids)` -> (b, P+n, dim) CFG-combined final-norm
    embeddings plus `vocab_proj = (W (dim, vocab), bias | None)`. The logits
    projection is then fused INTO the Pallas sampling kernel (the (b, n, vocab)
    logits never hit HBM); on non-TPU backends the projection runs once in XLA
    at (b, n) — still half the FLOPs of the stacked-CFG logits path. When
    given, `logits_fn`/`stacked_cfg_scale` are ignored.
    """
    assert (embeds_fn is None) or (vocab_proj is not None), (
        "embeds_fn requires vocab_proj=(W, bias)"
    )
    assert (embeds_fn is not None) or (logits_fn is not None)
    n = num_tokens_seq
    has_prime = prime_ids is not None and prime_ids.shape[-1] > 0
    prime_len = prime_ids.shape[-1] if has_prime else 0

    if critic_noise_anneal_schedule not in ("fixed", "decay", "increase"):
        raise ValueError(
            f"invalid critic noise anneal schedule {critic_noise_anneal_schedule!r}"
        )

    ids0 = jnp.full((batch, n), mask_id, dtype=jnp.int32)
    scores0 = jnp.zeros((batch, n), dtype=jnp.float32)

    def body(carry, step):
        ids, scores, key = carry

        # re-mask the k highest-scoring tokens; k follows the cosine schedule
        # (reference :484-491); step 0 masks everything
        t = step.astype(jnp.float32) / steps
        k = jnp.clip(
            jnp.round(n * jnp.cos(t * math.pi * 0.5)).astype(jnp.int32), 1, n
        )
        remask = topk_mask(scores, k)
        remask = jnp.logical_or(step == 0, remask)

        ids = jnp.where(remask, mask_id, ids)

        input_ids = (
            jnp.concatenate([prime_ids, ids], axis=-1) if has_prime else ids
        )

        steps_til_x0 = steps - (step + 1)
        temperature = starting_temperature * steps_til_x0.astype(jnp.float32) / steps

        key, k_sample, k_noise = jax.random.split(key, 3)
        fused = use_fused_sampling()
        fused_score = None
        logits = None
        if embeds_fn is not None:
            # embedding-space CFG + fused projection: the full-vocab logits
            # are never materialized (see project_gumbel_sample_with_score)
            h = embeds_fn(input_ids)
            if has_prime:
                h = h[:, prime_len:]
            w_vocab, b_vocab = vocab_proj
            if fused:
                seed = jax.random.randint(k_sample, (), 0, 2**31 - 1)
                pred_ids, fused_score = project_gumbel_sample_with_score(
                    h, w_vocab, b_vocab, seed, temperature
                )
            else:
                logits = jnp.einsum(
                    "bnd,dv->bnv",
                    h.astype(jnp.float32),
                    w_vocab.astype(jnp.float32),
                )
                if b_vocab is not None:
                    logits = logits + b_vocab.astype(jnp.float32)
                pred_ids = gumbel_sample(k_sample, logits, temperature).astype(
                    jnp.int32
                )
        else:
            logits = logits_fn(input_ids)
            if has_prime:
                logits = logits[:, prime_len:]
            if fused:
                # one Pallas pass: hardware-PRNG gumbel argmax + softmax score,
                # with the CFG combine fused in when logits arrive stacked
                # (replaces up to four XLA passes over the (n, vocab) logits)
                seed = jax.random.randint(k_sample, (), 0, 2**31 - 1)
                pred_ids, fused_score = gumbel_sample_with_score(
                    logits, seed, temperature, cond_scale=stacked_cfg_scale
                )
            else:
                if stacked_cfg_scale is not None:
                    cond, null = jnp.split(logits, 2, axis=0)
                    logits = null + (cond - null) * stacked_cfg_scale
                pred_ids = gumbel_sample(k_sample, logits, temperature).astype(
                    jnp.int32
                )
        ids = jnp.where(remask, pred_ids, ids)

        if critic_fn is not None:
            def with_critic(operand):
                ids_, k_noise_, step_ = operand
                crit_in = (
                    jnp.concatenate([prime_ids, ids_], axis=-1) if has_prime else ids_
                )
                s = critic_fn(crit_in)
                if has_prime:
                    s = s[:, prime_len:]
                if critic_noise_anneal_schedule == "fixed":
                    mult = 1.0
                elif critic_noise_anneal_schedule == "decay":
                    mult = (steps - step_ - 1).astype(jnp.float32) / steps
                else:  # increase
                    mult = (step_ + 1).astype(jnp.float32) / steps
                noise = (
                    noise_K
                    * (jax.random.uniform(k_noise_, s.shape) - 0.5)
                    * mult
                )
                return s + noise

            # skip the critic forward on the last step (reference :511)
            scores = jax.lax.cond(
                step < steps - 1,
                with_critic,
                lambda operand: jnp.zeros((batch, n), jnp.float32),
                (ids, k_noise, step),
            )
        else:
            if fused_score is not None:
                scores = fused_score
            else:
                probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                chosen = jnp.take_along_axis(
                    probs, pred_ids[..., None], axis=-1
                )[..., 0]
                scores = 1.0 - chosen
            scores = jnp.where(remask, scores, NEG_SCORE)

        return (ids, scores, key), None

    (ids, _, _), _ = jax.lax.scan(
        body, (ids0, scores0, rng), jnp.arange(steps)
    )
    return ids
