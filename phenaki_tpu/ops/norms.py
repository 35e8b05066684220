"""Normalization primitives.

TPU notes: LayerNorm here keeps statistics in float32 regardless of the
compute dtype (bf16-safe), and the learned beta is frozen at zero — the
"bias-less layernorm" stability trick the reference uses throughout
(reference attention.py:29-36).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def l2norm(t: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """L2-normalize along `axis` (reference attention.py:23-24).

    Computed in float32, cast back to input dtype. Uses rsqrt(max(ss, eps^2))
    so the gradient at an exactly-zero vector is zero instead of NaN (zero
    vectors occur legitimately: zero-padded text-embedding rows feed cross
    attention's k/v projections).
    """
    dtype = t.dtype
    t32 = t.astype(jnp.float32)
    ss = jnp.sum(t32 * t32, axis=axis, keepdims=True)
    return (t32 * jax.lax.rsqrt(jnp.maximum(ss, eps * eps))).astype(dtype)


class LayerNorm(nn.Module):
    """LayerNorm with learned gamma and beta frozen to zero.

    Mirrors reference attention.py:29-36. Statistics in fp32.
    """

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * gamma
        return out.astype(self.dtype)


class StandardLayerNorm(nn.Module):
    """Regular LayerNorm with learned gamma *and* beta.

    The reference patch-embedding stacks use `nn.LayerNorm` (with bias),
    e.g. dual patch-norm in cvivit.py:273-285 — this mirrors that.
    """

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (self.dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        out = (x32 - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta
        return out.astype(self.dtype)
