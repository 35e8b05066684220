"""Pallas flash-attention kernel vs the plain-XLA reference path.

Runs the kernel in interpret mode on the CPU test mesh; the math must match
`_reference_attention` (which is the same core as qk_norm_attention's XLA
branch) to fp32 tolerance, including bias, key masks, causal+ALiBi, padding
to block multiples, and gradients through the custom VJP.

Inputs follow the kernel's documented contract (module docstring /
flash_qk_attention): q and k are L2-normalized per head-dim with learned
per-dim scales — that is what every caller in this package produces, and the
bounded-score softmax shift (no running max; see _flash_kernel) relies on it.
`qk_scaled` models trained q_scale/k_scale vectors, including a stress
variant with aggressive 4x amplitudes and large biases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import phenaki_tpu.ops.pallas_attention as pa
from phenaki_tpu.ops.attention import qk_norm_attention
from phenaki_tpu.ops.norms import l2norm
from phenaki_tpu.ops.positional import alibi_bias

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pa, "_INTERPRET", True)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def qk_scaled(key, *shape, amp=2.0):
    """L2-normalized vectors times a learned-scale-style per-dim vector with
    values in roughly [-amp, amp] (matches Attention's q_scale/k_scale)."""
    d = shape[-1]
    scales = 1.0 + (amp - 1.0) * jax.random.uniform(
        jax.random.PRNGKey(key + 1000), (d,)
    )
    signs = jnp.sign(rand(key + 2000, d) + 0.1)
    return l2norm(rand(key, *shape)) * scales * signs


def test_flash_matches_reference_with_bias():
    b, h, n, d = 2, 3, 128, 32
    q, k = qk_scaled(0, b, h, n, d), qk_scaled(1, b, h, n, d)
    v = rand(2, b, h, n, d)
    bias = rand(3, h, n, n)

    out = pa.flash_qk_attention(q, k, v, bias, None, 8.0, False)
    ref = pa._reference_attention(q, k, v, bias, None, scale=8.0, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_large_scales_and_bias_stress():
    """Aggressive learned scales (4x) and large-amplitude biases (+-12):
    far beyond anything a trained QK-norm model reaches, still exact."""
    b, h, n, d = 1, 2, 128, 64
    q, k = qk_scaled(0, b, h, n, d, amp=4.0), qk_scaled(1, b, h, n, d, amp=4.0)
    v = rand(2, b, h, n, d)
    bias = rand(3, h, n, n) * 12.0

    out = pa.flash_qk_attention(q, k, v, bias, None, 8.0, False)
    ref = pa._reference_attention(q, k, v, bias, None, scale=8.0, causal=False)
    assert not bool(jnp.isnan(out).any())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5, rtol=5e-5)


def test_flash_unpadded_vs_padded_key_mask():
    # j=130 forces padding to the 128-block; padded keys must get zero weight
    b, h, i, j, d = 2, 2, 128, 130, 32
    q = qk_scaled(0, b, h, i, d)
    k = qk_scaled(1, b, h, j, d)
    v = rand(2, b, h, j, d)
    mask = jnp.asarray(np.random.RandomState(0).rand(b, j) > 0.2)
    kmask_add = jnp.where(mask, 0.0, pa.NEG_INF).astype(jnp.float32)

    out = pa.flash_qk_attention(q, k, v, None, kmask_add, 8.0, False)
    ref = pa._reference_attention(q, k, v, None, kmask_add, scale=8.0, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_causal_with_alibi():
    b, h, n, d = 1, 4, 128, 32
    q, k = qk_scaled(0, b, h, n, d), qk_scaled(1, b, h, n, d)
    v = rand(2, b, h, n, d)
    bias = alibi_bias(h, n, n)

    out = pa.flash_qk_attention(q, k, v, bias, None, 8.0, True)
    ref = pa._reference_attention(q, k, v, bias, None, scale=8.0, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference():
    b, h, n, d = 1, 2, 128, 32
    q, k = qk_scaled(0, b, h, n, d), qk_scaled(1, b, h, n, d)
    v = rand(2, b, h, n, d)
    bias = rand(3, h, n, n) * 0.1

    def loss_flash(q, k, v, bias):
        return jnp.sum(pa.flash_qk_attention(q, k, v, bias, None, 8.0, False) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            pa._reference_attention(q, k, v, bias, None, scale=8.0, causal=False) ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_flash, g_ref):
        # flash backward recomputes p = exp(s - lse) blockwise; f32 rounding
        # differs from the one-shot softmax path by up to ~5e-4 on O(1) grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=0)


def test_flash_gradients_causal_mask_and_padding():
    """Backward kernels under causal masking, key-padding masks, AND
    non-block-multiple shapes (padding rows/cols must contribute zero).
    q/k arrive L2-normalized per the cosine-attention contract."""
    b, h, n, j, d = 2, 2, 120, 130, 32  # both axes need padding
    q, k = l2norm(rand(0, b, h, n, d)), l2norm(rand(1, b, h, j, d))
    v = rand(2, b, h, j, d)
    mask = jnp.asarray(np.random.RandomState(3).rand(b, j) > 0.2)
    kmask_add = jnp.where(mask, 0.0, pa.NEG_INF).astype(jnp.float32)
    bias = rand(4, h, n, j) * 0.1

    def loss_flash(q, k, v, bias):
        return jnp.sum(
            pa.flash_qk_attention(q, k, v, bias, kmask_add, 8.0, True) ** 2
        )

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            pa._reference_attention(
                q, k, v, bias, kmask_add, scale=8.0, causal=True
            ) ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=0)


def test_qk_norm_attention_routes_to_flash():
    """The public op must produce identical results whether it routes to the
    kernel (interpret override) or the XLA path."""
    b, h, n, d = 1, 2, 128, 32
    q = qk_scaled(0, b, h, n, d)
    k = qk_scaled(1, b, h, n, d)
    v = rand(2, b, h, n, d)
    bias = rand(3, h, n, n) * 0.1
    mask = jnp.asarray(np.random.RandomState(1).rand(b, n) > 0.1)

    out_flash = qk_norm_attention(q, k, v, attn_bias=bias, key_mask=mask)

    import phenaki_tpu.ops.pallas_attention as mod

    old = mod._INTERPRET
    mod._INTERPRET = False  # forces the XLA branch on CPU backend
    try:
        out_xla = qk_norm_attention(q, k, v, attn_bias=bias, key_mask=mask)
    finally:
        mod._INTERPRET = old

    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), atol=2e-5, rtol=2e-5
    )
