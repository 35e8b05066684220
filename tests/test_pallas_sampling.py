"""Fused gumbel-sample + score kernel (ops/pallas_sampling.py), interpret mode.

The kernel's noise stream differs from threefry (hardware PRNG), so the checks
are semantic: argmax at temperature->0, exact score math given the returned
ids, determinism, and an empirical-distribution match at T=1. The TPU PRNG
primitives have no CPU lowering, so CPU tests inject uniform noise explicitly
(`noise=`); the hardware-PRNG path is exercised on the real chip by bench.py
and the verify flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import phenaki_tpu.ops.pallas_sampling as ps

pytestmark = pytest.mark.slow  # big compiles / loops: not in the quick tier


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ps, "_INTERPRET", True)


def _noise(key, shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, jnp.float32, 1e-6, 1 - 1e-6)


def test_low_temperature_is_argmax():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 16, 128) * 5, jnp.float32)
    ids, _ = ps.gumbel_sample_with_score(
        logits, seed=7, temperature=0.0, noise=_noise(0, logits.shape)
    )
    np.testing.assert_array_equal(np.asarray(ids), np.argmax(np.asarray(logits), -1))


def test_score_is_one_minus_softmax_prob():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 8, 128), jnp.float32)
    ids, score = ps.gumbel_sample_with_score(
        logits, seed=3, temperature=0.7, noise=_noise(1, logits.shape)
    )

    probs = jax.nn.softmax(logits, axis=-1)
    chosen = np.take_along_axis(np.asarray(probs), np.asarray(ids)[..., None], -1)[..., 0]
    np.testing.assert_allclose(np.asarray(score), 1.0 - chosen, atol=1e-5, rtol=1e-5)


def test_deterministic_per_noise():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(2, 8, 128), jnp.float32)
    n1, n2 = _noise(11, logits.shape), _noise(12, logits.shape)
    a1, s1 = ps.gumbel_sample_with_score(logits, seed=0, temperature=1.0, noise=n1)
    a2, s2 = ps.gumbel_sample_with_score(logits, seed=0, temperature=1.0, noise=n1)
    b1, _ = ps.gumbel_sample_with_score(logits, seed=0, temperature=1.0, noise=n2)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.any(np.asarray(a1) != np.asarray(b1))


def test_samples_follow_softmax_distribution():
    # 3 dominant categories among 128; empirical freq over many rows must
    # track softmax(logits/T) at T=1
    logits_row = np.full((128,), -4.0, np.float32)
    logits_row[[5, 40, 100]] = [2.0, 1.5, 1.0]
    rows = 4096
    logits = jnp.asarray(np.tile(logits_row, (1, rows, 1)), jnp.float32)

    ids, _ = ps.gumbel_sample_with_score(
        logits, seed=5, temperature=1.0, noise=_noise(5, logits.shape)
    )
    ids = np.asarray(ids).ravel()

    probs = np.exp(logits_row - logits_row.max())
    probs /= probs.sum()
    for cat in (5, 40, 100):
        emp = (ids == cat).mean()
        assert abs(emp - probs[cat]) < 0.03, (cat, emp, probs[cat])


def test_row_padding():
    # rows not divisible by the 8-row block: padding must not leak
    rng = np.random.RandomState(3)
    logits = jnp.asarray(rng.randn(1, 5, 128) * 4, jnp.float32)
    ids, score = ps.gumbel_sample_with_score(
        logits, seed=1, temperature=0.0, noise=_noise(6, logits.shape)
    )
    assert ids.shape == (1, 5)
    assert score.shape == (1, 5)
    np.testing.assert_array_equal(np.asarray(ids), np.argmax(np.asarray(logits), -1))


def test_stacked_cfg_combine_in_kernel():
    """Stacked (2b, n, V) cond/null input + cond_scale must equal combining
    in XLA first and then sampling with the same noise."""
    rng = np.random.RandomState(7)
    b, n, v = 2, 16, 128
    cond = jnp.asarray(rng.randn(b, n, v) * 2, jnp.float32)
    null = jnp.asarray(rng.randn(b, n, v) * 2, jnp.float32)
    stacked = jnp.concatenate([cond, null], axis=0)
    scale = 5.0
    noise = _noise(9, (b, n, v))

    ids_k, score_k = ps.gumbel_sample_with_score(
        stacked, seed=0, temperature=0.8, noise=noise, cond_scale=scale
    )
    combined = null + (cond - null) * scale
    ids_x, score_x = ps.gumbel_sample_with_score(
        combined, seed=0, temperature=0.8, noise=noise
    )
    np.testing.assert_array_equal(np.asarray(ids_k), np.asarray(ids_x))
    np.testing.assert_allclose(np.asarray(score_k), np.asarray(score_x), atol=1e-5)


def test_stacked_cfg_odd_rows_fallback():
    """rows % 8 != 0 takes the XLA-combine fallback; results must still match."""
    rng = np.random.RandomState(8)
    b, n, v = 1, 5, 128
    cond = jnp.asarray(rng.randn(b, n, v) * 3, jnp.float32)
    null = jnp.asarray(rng.randn(b, n, v) * 3, jnp.float32)
    stacked = jnp.concatenate([cond, null], axis=0)
    noise = _noise(10, (b, n, v))

    ids_k, _ = ps.gumbel_sample_with_score(
        stacked, seed=0, temperature=0.0, noise=noise, cond_scale=4.0
    )
    combined = null + (cond - null) * 4.0
    np.testing.assert_array_equal(
        np.asarray(ids_k), np.argmax(np.asarray(combined), -1)
    )


# ---------------------------------------------------------------------------
# Fused projection + sampling (project_gumbel_sample_with_score)
# ---------------------------------------------------------------------------


def _proj_inputs(seed, b, n, d, v, scale=2.0):
    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randn(b, n, d) * 0.2, jnp.float32)
    w = jnp.asarray(rng.randn(d, v) * (scale / np.sqrt(d)), jnp.float32)
    bias = jnp.asarray(rng.randn(v) * 0.1, jnp.float32)
    return h, w, bias


def test_project_matches_unfused_kernel():
    """Fused h@W+bias projection must equal materializing the logits and
    running the plain sampling kernel with the same injected noise."""
    b, n, d, v = 2, 12, 128, 1024
    h, w, bias = _proj_inputs(21, b, n, d, v)
    noise = _noise(21, (b, n, v))

    ids_f, score_f = ps.project_gumbel_sample_with_score(
        h, w, bias, seed=0, temperature=0.8, noise=noise
    )
    logits = jnp.einsum("bnd,dv->bnv", h, w) + bias
    ids_x, score_x = ps.gumbel_sample_with_score(
        logits, seed=0, temperature=0.8, noise=noise
    )
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_x))
    np.testing.assert_allclose(
        np.asarray(score_f), np.asarray(score_x), atol=1e-5, rtol=1e-5
    )


def test_project_multiple_vocab_blocks():
    """v=2048 runs two vocab-block iterations: the online-softmax carry and
    cross-block argmax must agree with the one-shot XLA reference."""
    b, n, d, v = 1, 16, 128, 2048
    h, w, bias = _proj_inputs(22, b, n, d, v, scale=4.0)
    noise = _noise(22, (b, n, v))

    ids_f, score_f = ps.project_gumbel_sample_with_score(
        h, w, bias, seed=0, temperature=0.5, noise=noise
    )
    logits = jnp.einsum("bnd,dv->bnv", h, w) + bias
    g = -jnp.log(-jnp.log(noise + 1e-10) + 1e-10)
    y = logits / 0.5 + g
    np.testing.assert_array_equal(
        np.asarray(ids_f), np.argmax(np.asarray(y), -1)
    )
    probs = jax.nn.softmax(logits, axis=-1)
    chosen = np.take_along_axis(
        np.asarray(probs), np.asarray(ids_f)[..., None], -1
    )[..., 0]
    np.testing.assert_allclose(
        np.asarray(score_f), 1.0 - chosen, atol=1e-5, rtol=1e-5
    )


def test_project_zero_temperature_is_argmax():
    b, n, d, v = 2, 8, 128, 1024
    h, w, bias = _proj_inputs(23, b, n, d, v, scale=6.0)
    ids_f, _ = ps.project_gumbel_sample_with_score(
        h, w, bias, seed=0, temperature=0.0, noise=_noise(23, (b, n, v))
    )
    logits = jnp.einsum("bnd,dv->bnv", h, w) + bias
    np.testing.assert_array_equal(
        np.asarray(ids_f), np.argmax(np.asarray(logits), -1)
    )


def test_project_no_bias_and_row_padding():
    # rows = 1*9 = 9 pads to the row block; bias=None must behave as zeros
    b, n, d, v = 1, 9, 128, 1024
    h, w, _ = _proj_inputs(24, b, n, d, v)
    noise = _noise(24, (b, n, v))
    ids_f, score_f = ps.project_gumbel_sample_with_score(
        h, w, None, seed=0, temperature=0.0, noise=noise
    )
    assert ids_f.shape == (b, n) and score_f.shape == (b, n)
    logits = jnp.einsum("bnd,dv->bnv", h, w)
    np.testing.assert_array_equal(
        np.asarray(ids_f), np.argmax(np.asarray(logits), -1)
    )


def test_project_unaligned_dim_falls_back():
    """d not a multiple of 128 routes through the XLA projection fallback."""
    b, n, d, v = 1, 8, 96, 1024
    h, w, bias = _proj_inputs(25, b, n, d, v)
    noise = _noise(25, (b, n, v))
    ids_f, score_f = ps.project_gumbel_sample_with_score(
        h, w, bias, seed=0, temperature=0.7, noise=noise
    )
    logits = jnp.einsum("bnd,dv->bnv", h, w) + bias
    ids_x, score_x = ps.gumbel_sample_with_score(
        logits, seed=0, temperature=0.7, noise=noise
    )
    np.testing.assert_array_equal(np.asarray(ids_f), np.asarray(ids_x))
    np.testing.assert_allclose(
        np.asarray(score_f), np.asarray(score_x), atol=1e-5, rtol=1e-5
    )
