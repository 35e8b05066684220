"""Fused chunked-vocab cross-entropy (ops/pallas_ce.py), interpret mode.

Loss and all three gradients (h, w, bias) must match the XLA reference
(materialized logits + optax CE) — the kernels are just a blocked evaluation
of the same math, so with f32 inputs the comparison is tight.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import phenaki_tpu.ops.pallas_ce as pce

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pce, "_INTERPRET", True)


def _inputs(seed, b, n, d, v, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(b, n, d) * 0.3, dtype)
    w = jnp.asarray(rng.randn(d, v) * (1.5 / np.sqrt(d)), dtype)
    bias = jnp.asarray(rng.randn(v) * 0.05, dtype)
    labels = jnp.asarray(rng.randint(0, v, (b, n)), jnp.int32)
    return h, w, bias, labels


def _xla_ce(h, w, bias, labels):
    logits = jnp.einsum(
        "bnd,dv->bnv", h.astype(jnp.float32), w.astype(jnp.float32)
    )
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels)


def test_loss_matches_xla():
    h, w, bias, labels = _inputs(0, 2, 12, 128, 2048)
    got = pce.fused_vocab_cross_entropy(h, w, bias, labels)
    want = _xla_ce(h, w, bias, labels)
    assert got.shape == (2, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_loss_row_padding_and_no_bias():
    # rows = 9 pads to the row block; bias=None behaves as zeros
    h, w, _, labels = _inputs(1, 1, 9, 128, 1024)
    got = pce.fused_vocab_cross_entropy(h, w, None, labels)
    want = _xla_ce(h, w, None, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_gradients_match_xla():
    h, w, bias, labels = _inputs(2, 2, 8, 128, 1024)
    # weighted mean, like Phenaki.loss's masked CE
    wgt = jnp.asarray(np.random.RandomState(3).rand(2, 8), jnp.float32)

    def fused_loss(h, w, bias):
        ce = pce.fused_vocab_cross_entropy(h, w, bias, labels)
        return jnp.sum(ce * wgt) / jnp.sum(wgt)

    def xla_loss(h, w, bias):
        ce = _xla_ce(h, w, bias, labels)
        return jnp.sum(ce * wgt) / jnp.sum(wgt)

    lf, gf = jax.value_and_grad(fused_loss, argnums=(0, 1, 2))(h, w, bias)
    lx, gx = jax.value_and_grad(xla_loss, argnums=(0, 1, 2))(h, w, bias)
    np.testing.assert_allclose(float(lf), float(lx), atol=1e-5, rtol=1e-5)
    for name, a, b in zip(("dh", "dw", "dbias"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=2e-4, err_msg=name
        )


def test_gradients_with_row_padding():
    h, w, bias, labels = _inputs(4, 1, 11, 128, 1024)

    def fused_loss(h):
        return pce.fused_vocab_cross_entropy(h, w, bias, labels).mean()

    def xla_loss(h):
        return _xla_ce(h, w, bias, labels).mean()

    gf = jax.grad(fused_loss)(h)
    gx = jax.grad(xla_loss)(h)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=2e-4, rtol=2e-4)


def test_multiple_vocab_blocks_label_gather():
    """Labels land in different vocab blocks; the blockwise one-hot gather and
    the online LSE must still reproduce the exact CE."""
    b, n, d, v = 1, 16, 128, 4096
    h, w, bias, _ = _inputs(5, b, n, d, v)
    # place labels across all four 1024-blocks deterministically
    labels = jnp.asarray(
        (np.arange(16) * 257 + 11) % v, jnp.int32
    ).reshape(1, 16)
    got = pce.fused_vocab_cross_entropy(h, w, bias, labels)
    want = _xla_ce(h, w, bias, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_bf16_inputs_close_to_f32_reference():
    h, w, bias, labels = _inputs(6, 1, 8, 128, 1024, dtype=jnp.bfloat16)
    got = pce.fused_vocab_cross_entropy(h, w, bias, labels)
    want = _xla_ce(h, w, bias, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-2, rtol=5e-2)
