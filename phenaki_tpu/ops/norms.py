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


_L2_EPS = 1e-12


@jax.custom_vjp
def l2norm_scaled(t: jax.Array, scale: jax.Array) -> jax.Array:
    """l2norm(t) * scale over the last axis, with a memory-lean VJP.

    Same math as `l2norm(t) * scale` (the q/k path of QK-norm attention),
    but the backward saves ONLY the original input: plain autodiff stashes
    the fp32 upcast, the rsqrt product, and the scaled result per transformer
    layer — under `nn.scan` that is 3 stacked fp32 tensors per projection per
    layer of pure HBM stash traffic (measured in the train-step trace). Here
    the backward recomputes them from the (bf16) input.
    """
    return l2norm(t) * scale.astype(t.dtype)


def _l2s_fwd(t, scale):
    return l2norm_scaled(t, scale), (t, scale)


def _l2s_bwd(res, dy):
    t, scale = res
    t32 = t.astype(jnp.float32)
    s32 = scale.astype(jnp.float32)
    dy32 = dy.astype(jnp.float32)
    ss = jnp.sum(t32 * t32, axis=-1, keepdims=True)
    clamped = ss < _L2_EPS * _L2_EPS
    n = jax.lax.rsqrt(jnp.maximum(ss, _L2_EPS * _L2_EPS))
    u = t32 * n
    du = dy32 * s32  # d/d(normalized)
    # below the clamp the norm factor is constant wrt t (no projection term)
    proj = jnp.where(clamped, 0.0, jnp.sum(u * du, axis=-1, keepdims=True))
    dt = n * (du - u * proj)
    ds = jnp.sum(dy32 * u, axis=tuple(range(dy.ndim - 1)))
    return dt.astype(t.dtype), ds.astype(scale.dtype)


l2norm_scaled.defvjp(_l2s_fwd, _l2s_bwd)


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
