"""Pipeline parallelism (parallel/pipeline.py): the GPipe-scheduled stack
must match the sequential scan-layers Transformer exactly — same layer body,
same order, only the schedule differs — and differentiate through."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.models.transformer import Transformer
from phenaki_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_transformer_apply,
)

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        len(jax.devices()) < 8, reason="needs 8 virtual devices"
    ),
]

DIM, DEPTH, HEADS, DH = 32, 4, 2, 16
CTX_DIM = 16
B, N, M_CTX = 4, 8, 5


def build(has_cross_attn=True, causal=False, peg=False):
    tr = Transformer(
        dim=DIM,
        depth=DEPTH,
        dim_context=CTX_DIM if has_cross_attn else None,
        causal=causal,
        dim_head=DH,
        heads=HEADS,
        peg=peg,
        peg_layout="thw",
        has_cross_attn=has_cross_attn,
        scan_layers=True,
    )
    kw = dict(
        video_shape=(B, 2, 2, 2) if peg else None,
        context=jnp.asarray(
            np.random.RandomState(1).randn(B, M_CTX, CTX_DIM), jnp.float32
        )
        if has_cross_attn
        else None,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, DIM), jnp.float32)
    variables = tr.init(jax.random.PRNGKey(0), x, **kw)
    return tr, variables, x, kw


@pytest.mark.parametrize("pp,microbatches", [(2, 2), (4, 4), (2, 4)])
def test_pipeline_matches_sequential(pp, microbatches):
    tr, variables, x, kw = build()
    bias = jnp.asarray(
        np.random.RandomState(2).randn(HEADS, N, N).astype(np.float32) * 0.1
    )
    sam = jnp.ones((B, N), bool).at[:, -2:].set(False)
    ccm = jnp.ones((B, M_CTX), bool).at[:, -1:].set(False)

    expected = tr.apply(
        variables, x, attn_bias=bias, self_attn_mask=sam,
        cross_attn_context_mask=ccm, **kw,
    )

    mesh = make_pipeline_mesh(pp, jax.devices()[:pp])
    got = pipeline_transformer_apply(
        tr, variables["params"], x, mesh,
        num_microbatches=microbatches,
        attn_bias=bias, self_attn_mask=sam, cross_attn_context_mask=ccm,
        context=kw["context"],
    )
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=2e-5, rtol=2e-5
    )


def test_pipeline_with_peg_grid():
    tr, variables, x, kw = build(has_cross_attn=False, peg=True)
    expected = tr.apply(variables, x, **kw)

    mesh = make_pipeline_mesh(2, jax.devices()[:2])
    got = pipeline_transformer_apply(
        tr, variables["params"], x, mesh,
        num_microbatches=2, video_shape=kw["video_shape"],
    )
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=2e-5, rtol=2e-5
    )


def test_pipeline_gradients_match():
    """Reverse-mode through the schedule (ppermute transpose = reverse
    rotation) must give the sequential gradients."""
    tr, variables, x, kw = build(has_cross_attn=False)

    def loss_seq(params, x):
        return jnp.sum(tr.apply({"params": params}, x) ** 2)

    mesh = make_pipeline_mesh(2, jax.devices()[:2])

    def loss_pipe(params, x):
        out = pipeline_transformer_apply(
            tr, params, x, mesh, num_microbatches=2
        )
        return jnp.sum(out**2)

    g_seq = jax.grad(loss_seq)(variables["params"], x)
    g_pipe = jax.grad(loss_pipe)(variables["params"], x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_seq), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_pipeline_tp_matches_sequential():
    """pp x tp composition: each stage's layer body runs manual Megatron TP
    (heads + GEGLU columns sharded, bias head-sliced, null-KV packed) and
    must still match the sequential dense stack."""
    from phenaki_tpu.parallel.mesh import make_mesh

    tr, variables, x, kw = build()  # cross-attn: exercises null-KV packing
    bias = jnp.asarray(
        np.random.RandomState(2).randn(HEADS, N, N).astype(np.float32) * 0.1
    )
    sam = jnp.ones((B, N), bool).at[:, -2:].set(False)
    ccm = jnp.ones((B, M_CTX), bool).at[:, -1:].set(False)

    expected = tr.apply(
        variables, x, attn_bias=bias, self_attn_mask=sam,
        cross_attn_context_mask=ccm, **kw,
    )

    mesh = make_mesh(jax.devices()[:8], dp=2, tp=2, pp=2)
    assert mesh.shape == {"dp": 2, "tp": 2, "pp": 2}
    got = pipeline_transformer_apply(
        tr, variables["params"], x, mesh,
        num_microbatches=2,
        attn_bias=bias, self_attn_mask=sam, cross_attn_context_mask=ccm,
        context=kw["context"],
    )
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=2e-5, rtol=2e-5
    )


def test_pipeline_tp_gradients_match():
    """Gradients w.r.t. the UNPACKED global params through the pp x tp
    pipeline (the tp repack is differentiated through) must match the
    sequential stack."""
    from phenaki_tpu.parallel.mesh import make_mesh

    tr, variables, x, kw = build(has_cross_attn=False)

    def loss_seq(params, x):
        return jnp.sum(tr.apply({"params": params}, x) ** 2)

    mesh = make_mesh(jax.devices()[:4], dp=1, tp=2, pp=2)

    def loss_pipe(params, x):
        out = pipeline_transformer_apply(
            tr, params, x, mesh, num_microbatches=2
        )
        return jnp.sum(out**2)

    g_seq = jax.grad(loss_seq)(variables["params"], x)
    g_pipe = jax.grad(loss_pipe)(variables["params"], x)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_seq), jax.tree_util.tree_leaves(g_pipe)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
        )


def test_pipeline_under_jit_with_dp_axis():
    """2-D (dp x pp) mesh: the pipeline rides 'pp' while the batch could
    shard over 'dp'; whole thing compiles under one jit."""
    tr, variables, x, kw = build(has_cross_attn=False)
    mesh = make_pipeline_mesh(2, jax.devices()[:8], dp=4)
    assert mesh.shape == {"dp": 4, "pp": 2}

    @jax.jit
    def f(params, x):
        return pipeline_transformer_apply(
            tr, params, x, mesh, num_microbatches=4
        )

    got = f(variables["params"], x)
    expected = tr.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(expected), np.asarray(got), atol=2e-5, rtol=2e-5
    )
