"""Ring attention (sequence-sharded over the virtual 8-device mesh) must match
dense attention exactly — bias, key-padding masks, causal, bf16 inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.ops.attention import qk_norm_attention
from phenaki_tpu.parallel.mesh import make_mesh
from phenaki_tpu.parallel.ring_attention import sequence_sharded_attention

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def setup(n=64, b=2, h=2, d=16):
    # the op contract (like qk_norm_attention) is cosine attention: q/k arrive
    # L2-normalized from the caller, so scores live in [-scale, scale]
    from phenaki_tpu.ops.norms import l2norm

    q, k = l2norm(rand(0, b, h, n, d)), l2norm(rand(1, b, h, n, d))
    v = rand(2, b, h, n, d)
    return q, k, v


def test_ring_matches_dense_with_bias():
    q, k, v = setup()
    bias = rand(3, 2, 64, 64) * 0.3
    mesh = make_mesh(tp=1)  # dp=8 used as the sequence axis

    dense = qk_norm_attention(q, k, v, attn_bias=bias)
    ring = sequence_sharded_attention(q, k, v, mesh, attn_bias=bias)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_matches_dense_causal():
    q, k, v = setup()
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v, causal=True)
    ring = sequence_sharded_attention(q, k, v, mesh, causal=True)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_matches_dense_key_mask():
    q, k, v = setup()
    mask = jnp.asarray(np.random.RandomState(0).rand(2, 64) > 0.25)
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v, key_mask=mask)
    ring = sequence_sharded_attention(q, k, v, mesh, key_mask=mask)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(dense), atol=2e-5)


def test_ring_bf16_inputs():
    q, k, v = (t.astype(jnp.bfloat16) for t in setup())
    mesh = make_mesh(tp=1)

    dense = qk_norm_attention(q, k, v)
    ring = sequence_sharded_attention(q, k, v, mesh)
    assert ring.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ring, np.float32), np.asarray(dense, np.float32), atol=2e-2
    )


def test_ring_grad_flows():
    q, k, v = setup()
    mesh = make_mesh(tp=1)

    def loss_ring(q, k, v):
        return jnp.sum(sequence_sharded_attention(q, k, v, mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(qk_norm_attention(q, k, v) ** 2)

    g_r = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_d = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_r, g_d):
        # rtol=0: ~1e-10 gradient components are reduction-order noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-5)
