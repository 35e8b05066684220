"""Quantizer tests: LFQ and cosine VQ (reference dep `vector-quantize-pytorch`,
call sites cvivit.py:562-574,437-443 — rebuilt from scratch)."""

import jax
import jax.numpy as jnp
import numpy as np

from phenaki_tpu.ops.quantize import LFQ, VectorQuantize


def test_lfq_roundtrip_and_shapes():
    lfq = LFQ(dim=32, codebook_size=256)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params = lfq.init(jax.random.PRNGKey(1), x)
    q, idx, aux = lfq.apply(params, x)
    assert q.shape == x.shape
    assert idx.shape == (2, 10)
    assert idx.dtype == jnp.int32
    assert np.all(np.asarray(idx) >= 0) and np.all(np.asarray(idx) < 256)
    assert np.isfinite(float(aux))
    # indices -> codes must reproduce the quantized output exactly
    codes = lfq.apply(params, idx, method=LFQ.indices_to_codes)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(q), atol=1e-5)


def test_lfq_no_projection_when_dim_matches_bits():
    lfq = LFQ(dim=8, codebook_size=256)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    params = lfq.init(jax.random.PRNGKey(1), x)
    assert params.get("params", {}) == {}  # sign-quantization is parameter-free
    q, idx, _ = lfq.apply(params, x)
    np.testing.assert_array_equal(np.asarray(q), np.sign(np.asarray(x)))


def test_lfq_gradients_flow_straight_through():
    lfq = LFQ(dim=8, codebook_size=256, entropy_loss_weight=0.0, commitment_loss_weight=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    params = lfq.init(jax.random.PRNGKey(1), x)

    def f(x):
        q, _, _ = lfq.apply(params, x)
        return jnp.sum(q * jnp.arange(8.0))

    g = jax.grad(f)(x)
    np.testing.assert_allclose(
        np.asarray(g), np.broadcast_to(np.arange(8.0), (1, 4, 8)), atol=1e-5
    )


def test_lfq_factorized_entropy_for_large_codebook():
    lfq = LFQ(dim=32, codebook_size=2**16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    params = lfq.init(jax.random.PRNGKey(1), x)
    q, idx, aux = lfq.apply(params, x)
    assert np.isfinite(float(aux))
    assert np.all(np.asarray(idx) < 2**16)


def test_vq_basic_and_codebook_update():
    vq = VectorQuantize(dim=16, codebook_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16))
    variables = vq.init(jax.random.PRNGKey(1), x)
    (q, idx, aux), new_state = vq.apply(
        variables, x, mutable=["vq_stats"]
    )
    assert q.shape == x.shape and idx.shape == (2, 12)
    assert np.isfinite(float(aux))
    # EMA state moved
    assert not np.allclose(
        np.asarray(new_state["vq_stats"]["cluster_size"]),
        np.asarray(variables["vq_stats"]["cluster_size"]),
    )
    # lookup matches quantized output (unit-norm cosine codebook)
    codes = vq.apply(variables, idx, method=VectorQuantize.codebook_lookup)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(q), atol=1e-5)


def test_vq_mask_excludes_positions():
    vq = VectorQuantize(dim=16, codebook_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
    variables = vq.init(jax.random.PRNGKey(1), x)
    mask = jnp.ones((1, 8), bool).at[:, 4:].set(False)
    (q1, _, aux1), st1 = vq.apply(variables, x, mask=mask, mutable=["vq_stats"])
    x2 = x.at[:, 4:].set(jax.random.normal(jax.random.PRNGKey(9), (1, 4, 16)) * 5)
    (q2, _, aux2), st2 = vq.apply(variables, x2, mask=mask, mutable=["vq_stats"])
    # aux loss and EMA stats must ignore masked-out positions
    np.testing.assert_allclose(float(aux1), float(aux2), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st1["vq_stats"]["cluster_size"]),
        np.asarray(st2["vq_stats"]["cluster_size"]),
        atol=1e-6,
    )


def test_lfq_large_codebook_gradients_finite_when_saturated():
    """Regression: with the 65536-entry codebook (factorized entropy path) and
    saturated bit probabilities (|z| >> 1/inv_temperature), the entropy
    gradient must stay finite — 0 * log(0) products NaN'd every flagship
    training step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phenaki_tpu.ops.quantize import LFQ

    lfq = LFQ(dim=32, codebook_size=65536)  # 16 bits > full_entropy_max_bits
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 32) * 3, jnp.float32)
    variables = lfq.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        out = lfq.apply({"params": params}, x)
        return out.aux_loss + jnp.sum(out.quantized ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1))(variables["params"], x)
    assert np.isfinite(float(val))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all(), "NaN/Inf gradient"
