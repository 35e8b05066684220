"""Unit tests for the L1 primitives (reference attention.py parity-by-behavior)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.ops.norms import LayerNorm, StandardLayerNorm, l2norm
from phenaki_tpu.ops.feedforward import FeedForward, geglu
from phenaki_tpu.ops.positional import (
    PEG,
    ContinuousPositionBias,
    alibi_bias,
    alibi_slopes,
)
from phenaki_tpu.ops.attention import Attention
from phenaki_tpu.ops.sampling import (
    cosine_schedule,
    get_mask_subset_with_prob,
    gumbel_sample,
    topk_mask,
)


def test_l2norm():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8))
    y = l2norm(x)
    np.testing.assert_allclose(jnp.linalg.norm(y, axis=-1), 1.0, atol=1e-5)


def test_layernorm_no_beta():
    ln = LayerNorm(16)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16)) * 3 + 5
    params = ln.init(jax.random.PRNGKey(1), x)
    # only gamma, no beta
    assert set(params["params"].keys()) == {"gamma"}
    y = ln.apply(params, x)
    np.testing.assert_allclose(np.mean(np.asarray(y), -1), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.std(np.asarray(y), -1), 1.0, atol=1e-2)


def test_geglu_matches_manual():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10))
    a, g = np.split(np.asarray(x), 2, axis=-1)
    expected = a * (g * 0.5 * (1 + np.vectorize(math.erf)(g / math.sqrt(2))))
    np.testing.assert_allclose(np.asarray(geglu(x)), expected, atol=1e-5)


def test_feedforward_inner_dim():
    ff = FeedForward(dim=64)
    x = jnp.zeros((2, 5, 64))
    params = ff.init(jax.random.PRNGKey(0), x)
    # inner = 4 * 2/3 * 64 = 170; proj_in maps to 2*inner
    assert params["params"]["proj_in"]["kernel"].shape == (64, 2 * int(4 * 2 / 3 * 64))
    assert ff.apply(params, x).shape == (2, 5, 64)


def test_alibi_slopes_power_of_two():
    s = alibi_slopes(8)
    expected = [2 ** (-i) for i in range(1, 9)]
    np.testing.assert_allclose(s, expected, rtol=1e-6)


def test_alibi_bias_structure():
    bias = np.asarray(alibi_bias(4, 3, 5))
    assert bias.shape == (4, 3, 5)
    # query a sits at absolute position (j - i + a); zero at own position
    for a in range(3):
        assert bias[0, a, 5 - 3 + a] == 0.0
    # strictly decreasing with distance, scaled per-head
    s = alibi_slopes(4)
    np.testing.assert_allclose(bias[2, 0, 0], -s[2] * 2, rtol=1e-5)


def test_cpb_shapes_and_translation_invariance():
    cpb = ContinuousPositionBias(dim=32, heads=4, num_dims=2)
    params = cpb.init(jax.random.PRNGKey(0), 3, 4)
    bias = cpb.apply(params, 3, 4)
    assert bias.shape == (4, 12, 12)
    # relative bias: diagonal entries all equal (zero relative offset)
    d = np.asarray(jnp.diagonal(bias, axis1=1, axis2=2))
    np.testing.assert_allclose(d - d[:, :1], np.zeros_like(d), atol=1e-6)


def test_cpb_table_matches_dense_formulation():
    """The unique-displacement-table CPB (MLP over prod(2D-1) rows + gather)
    must equal the dense formulation (MLP over all N^2 relative-coordinate
    pairs) exactly — same function, 167x less MLP work at flagship shape."""
    cpb = ContinuousPositionBias(dim=16, heads=4, num_dims=3)
    params = cpb.init(jax.random.PRNGKey(0), 3, 4, 5)
    got = cpb.apply(params, 3, 4, 5)

    positions = [jnp.arange(d, dtype=jnp.float32) for d in (3, 4, 5)]
    grid = jnp.stack(jnp.meshgrid(*positions, indexing="ij"))
    grid = grid.reshape(grid.shape[0], -1).T
    rel = grid[:, None, :] - grid[None, :, :]
    rel = jnp.sign(rel) * jnp.log(jnp.abs(rel) + 1.0)
    p = params["params"]
    x = rel @ p["net_in"]["kernel"] + p["net_in"]["bias"]
    x = jax.nn.leaky_relu(x, 0.1)
    x = x @ p["net_hidden_0"]["kernel"] + p["net_hidden_0"]["bias"]
    x = jax.nn.leaky_relu(x, 0.1)
    x = x @ p["net_out"]["kernel"] + p["net_out"]["bias"]
    expected = jnp.transpose(x, (2, 0, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_peg_causal_does_not_leak_future():
    peg = PEG(dim=8, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2, 8))
    params = peg.init(jax.random.PRNGKey(1), x)
    y1 = peg.apply(params, x)
    x2 = x.at[:, 2:].set(0.0)  # perturb future frames
    y2 = peg.apply(params, x2)
    # frames 0..1 must be identical (causal frame padding (2, 0))
    np.testing.assert_allclose(np.asarray(y1[:, :2]), np.asarray(y2[:, :2]), atol=1e-5)
    assert not np.allclose(np.asarray(y1[:, 2:]), np.asarray(y2[:, 2:]))


def test_peg_flat_sequence_matches_grid():
    peg = PEG(dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4, 8))
    params = peg.init(jax.random.PRNGKey(1), x)
    y_grid = peg.apply(params, x)
    x_flat = x.reshape(2, -1, 8)
    y_flat = peg.apply(params, x_flat, shape=(2, 3, 4, 4))
    np.testing.assert_allclose(
        np.asarray(y_grid).reshape(2, -1, 8), np.asarray(y_flat), atol=1e-5
    )


def test_attention_self_shapes_and_causality():
    attn = Attention(dim=32, dim_head=16, heads=2, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    params = attn.init(jax.random.PRNGKey(1), x)
    y1 = attn.apply(params, x)
    assert y1.shape == (2, 6, 32)
    x2 = x.at[:, 4:].set(0.0)
    y2 = attn.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-5)


def test_attention_key_mask():
    attn = Attention(dim=32, dim_head=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
    params = attn.init(jax.random.PRNGKey(1), x)
    mask = jnp.ones((2, 6), bool).at[:, 4:].set(False)
    y1 = attn.apply(params, x, mask=mask)
    x2 = x.at[:, 4:].set(99.0)  # only changes masked-out keys...
    # ...but also changes those queries' own outputs; compare unmasked rows
    y2 = attn.apply(params, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]), atol=1e-4)


def test_attention_cross_with_null_kv_handles_fully_masked_context():
    attn = Attention(dim=32, dim_context=16, dim_head=16, heads=2, num_null_kv=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    params = attn.init(jax.random.PRNGKey(1), x, context=ctx)
    mask = jnp.zeros((2, 7), bool)  # CFG null branch: everything dropped
    y = attn.apply(params, x, context=ctx, mask=mask)
    assert np.all(np.isfinite(np.asarray(y)))


def test_attention_bias_shifts_output():
    attn = Attention(dim=32, dim_head=16, heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 32))
    params = attn.init(jax.random.PRNGKey(1), x)
    bias = jnp.zeros((2, 4, 4)).at[:, :, 0].set(50.0)  # force attending token 0
    y = attn.apply(params, x, attn_bias=bias)
    yb = attn.apply(params, x)
    assert not np.allclose(np.asarray(y), np.asarray(yb))


def test_get_mask_subset_exact_counts():
    rng = jax.random.PRNGKey(0)
    mask = jnp.ones((4, 20), bool).at[1, 10:].set(False)
    prob = jnp.asarray([0.5, 0.5, 0.1, 0.9])
    sub = get_mask_subset_with_prob(rng, mask, prob)
    counts = np.asarray(jnp.sum(sub, -1))
    np.testing.assert_array_equal(counts, [10, 5, 2, 18])
    # never masks padded positions
    assert not np.any(np.asarray(sub)[1, 10:])


def test_get_mask_subset_min_one():
    sub = get_mask_subset_with_prob(jax.random.PRNGKey(0), jnp.ones((2, 8), bool), 0.0)
    np.testing.assert_array_equal(np.asarray(jnp.sum(sub, -1)), [1, 1])


def test_topk_mask():
    scores = jnp.asarray([[3.0, 1.0, 2.0, 5.0], [0.0, -1.0, 7.0, 2.0]])
    m = np.asarray(topk_mask(scores, jnp.asarray([2, 1])))
    np.testing.assert_array_equal(m, [[True, False, False, True], [False, False, True, False]])
    m2 = np.asarray(topk_mask(scores, 3))
    assert m2.sum() == 6


def test_gumbel_sample_zero_temperature_is_argmax():
    logits = jnp.asarray([[0.0, 5.0, 1.0]])
    out = gumbel_sample(jax.random.PRNGKey(0), logits, temperature=0.0)
    assert int(out[0]) == 1


def test_cosine_schedule_endpoints():
    assert float(cosine_schedule(0.0)) == pytest.approx(1.0)
    assert float(cosine_schedule(1.0)) == pytest.approx(0.0, abs=1e-7)


def test_transformer_remat_matches_no_remat():
    """remat=True must change memory behavior only: outputs and gradients
    identical to the plain transformer."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phenaki_tpu.models.transformer import Transformer

    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 32), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)

    def build(remat):
        return Transformer(
            dim=32, depth=2, dim_head=16, heads=2, has_cross_attn=True,
            dim_context=16, remat=remat,
        )

    t0, t1 = build(False), build(True)
    v = t0.init(jax.random.PRNGKey(0), x, context=ctx)

    def loss(params, t):
        return jnp.sum(t.apply(params, x, context=ctx) ** 2)

    l0, g0 = jax.value_and_grad(loss)(v, t0)
    l1, g1 = jax.value_and_grad(loss)(v, t1)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_transformer_scan_layers_matches_unrolled():
    """nn.scan over stacked layer params must be bit-compatible with the
    unrolled loop given the same (stacked) parameters."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from phenaki_tpu.models.transformer import Transformer, stack_layer_params

    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 32), jnp.float32)
    ctx = jnp.asarray(np.random.RandomState(1).randn(2, 5, 16), jnp.float32)
    bias = jnp.asarray(np.random.RandomState(2).randn(2, 12, 12) * 0.1, jnp.float32)

    kw = dict(
        dim=32, depth=3, dim_head=16, heads=2, has_cross_attn=True,
        dim_context=16, peg=True,
    )
    t_unrolled = Transformer(**kw)
    t_scan = Transformer(**kw, scan_layers=True)

    v = t_unrolled.init(
        jax.random.PRNGKey(0), x, video_shape=(2, 3, 2, 2), context=ctx,
        attn_bias=bias,
    )
    v_scan = {"params": stack_layer_params(v["params"], depth=3)}

    out_u = t_unrolled.apply(
        v, x, video_shape=(2, 3, 2, 2), context=ctx, attn_bias=bias
    )
    out_s = t_scan.apply(
        v_scan, x, video_shape=(2, 3, 2, 2), context=ctx, attn_bias=bias
    )
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), atol=1e-5, rtol=1e-5
    )

    # gradients must match too (scan differentiates through the stack)
    def loss_u(p):
        return jnp.sum(
            t_unrolled.apply(
                {"params": p}, x, video_shape=(2, 3, 2, 2), context=ctx,
                attn_bias=bias,
            ) ** 2
        )

    def loss_s(p):
        return jnp.sum(
            t_scan.apply(
                {"params": p}, x, video_shape=(2, 3, 2, 2), context=ctx,
                attn_bias=bias,
            ) ** 2
        )

    g_u = jax.grad(loss_u)(v["params"])
    g_s = jax.grad(loss_s)(v_scan["params"])
    g_u_stacked = stack_layer_params(g_u, depth=3)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_u_stacked), jax.tree_util.tree_leaves(g_s)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ranks_matrix_matches_sort_path():
    """The O(n^2) comparison-matrix rank must equal the stable two-sort rank,
    including deterministic tie-breaks (ties ranked by ascending index)."""
    from phenaki_tpu.ops import sampling as S

    rng = np.random.RandomState(0)
    # quantized values force plenty of ties
    scores = jnp.asarray(np.round(rng.randn(4, 37) * 2) / 2, jnp.float32)
    got = S._ranks_descending(scores)
    order = jnp.argsort(-scores, axis=-1)
    want = jnp.argsort(order, axis=-1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # each row is a permutation of 0..n-1
    np.testing.assert_array_equal(
        np.sort(np.asarray(got), -1), np.tile(np.arange(37), (4, 1))
    )


def test_ranks_large_rows_fall_back_to_sort():
    from phenaki_tpu.ops import sampling as S

    n = 1 << 13
    rng = np.random.RandomState(1)
    scores = jnp.asarray(rng.randn(2, n), jnp.float32)
    assert scores.size * n > S._RANK_MATRIX_MAX_ELEMS
    got = S._ranks_descending(scores)
    want = jnp.argsort(jnp.argsort(-scores, -1), -1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_torch_init_distributions():
    """Package-wide torch-default init (ops/torch_init.py): kernels bounded
    by 1/sqrt(fan_in) uniform (kaiming_uniform(a=sqrt(5))), biases likewise,
    embeddings N(0,1) — matching the reference's torch modules (PARITY.md
    measures why this matters)."""
    from phenaki_tpu.ops.torch_init import (
        torch_bias_init,
        torch_embedding_init,
        torch_kernel_init,
    )

    k = jax.random.PRNGKey(0)
    w = torch_kernel_init(k, (256, 128), jnp.float32)
    bound = 256 ** -0.5
    assert float(jnp.max(jnp.abs(w))) <= bound + 1e-6
    # uniform, not normal: variance ~ bound^2/3
    assert abs(float(jnp.var(w)) - bound**2 / 3) < 0.1 * bound**2 / 3

    # conv layout (spatial..., in, out): fan_in = 3*3*16
    wc = torch_kernel_init(k, (3, 3, 16, 32), jnp.float32)
    bc = (3 * 3 * 16) ** -0.5
    assert float(jnp.max(jnp.abs(wc))) <= bc + 1e-6

    b = torch_bias_init(64)(k, (32,), jnp.float32)
    assert float(jnp.max(jnp.abs(b))) <= 64 ** -0.5 + 1e-6
    assert float(jnp.max(jnp.abs(b))) > 0  # NOT zeros

    e = torch_embedding_init(k, (1000, 64), jnp.float32)
    assert abs(float(jnp.std(e)) - 1.0) < 0.05
