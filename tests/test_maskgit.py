"""MaskGit / TokenCritic / SelfCritic tests (reference phenaki_pytorch.py:105-336)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phenaki_tpu.models.maskgit import MaskGit, SelfCritic, TokenCritic


def tiny_maskgit(**kw):
    cfg = dict(
        dim=32,
        num_tokens=64,
        max_seq_len=32,
        depth=1,
        heads=2,
        dim_head=16,
        dim_context=24,
    )
    cfg.update(kw)
    return MaskGit(**cfg)


PATCH_SHAPE = (2, 2, 2)  # t, h, w -> 8 tokens


@pytest.fixture(scope="module")
def mg_and_vars():
    mg = tiny_maskgit()
    ids = jnp.zeros((2, 8), jnp.int32)
    ctx = jnp.zeros((2, 5, 24))
    variables = mg.init(
        jax.random.PRNGKey(0), ids, video_patch_shape=PATCH_SHAPE, context=ctx
    )
    return mg, variables


def test_forward_shapes(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 65)  # incl mask_id
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    logits = mg.apply(variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx)
    assert logits.shape == (2, 8, 64)
    # grid-shaped ids infer the patch shape
    logits2 = mg.apply(variables, ids.reshape(2, 2, 2, 2), context=ctx)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2), atol=1e-5)


def test_return_embeds(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jnp.zeros((2, 8), jnp.int32)
    ctx = jnp.zeros((2, 5, 24))
    emb = mg.apply(
        variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx, return_embeds=True
    )
    assert emb.shape == (2, 8, 32)


def test_cfg_scale_one_equals_plain(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    plain = mg.apply(variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx)
    cfg = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        cond_scale=1.0,
        method=MaskGit.forward_with_cond_scale,
    )
    np.testing.assert_allclose(np.asarray(plain), np.asarray(cfg), atol=1e-5)


def test_cfg_combines_cond_and_null(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    tm = jnp.ones((2, 5), bool)
    cond = mg.apply(
        variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx, text_mask=tm
    )
    null = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=jnp.zeros((2, 5), bool),
    )
    scale = 3.0
    expected = null + (cond - null) * scale
    got = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=tm,
        cond_scale=scale,
        method=MaskGit.forward_with_cond_scale,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)


def test_cond_drop_all_equals_null_mask(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 64)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 24))
    dropped = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=jnp.ones((2, 5), bool),
        cond_drop_prob=1.0,
        rngs={"cond_drop": jax.random.PRNGKey(3)},
    )
    null = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=jnp.zeros((2, 5), bool),
    )
    np.testing.assert_allclose(np.asarray(dropped), np.asarray(null), atol=1e-5)


def test_unconditional_maskgit():
    mg = tiny_maskgit(unconditional=True, dim_context=None)
    ids = jnp.zeros((1, 8), jnp.int32)
    variables = mg.init(jax.random.PRNGKey(0), ids, video_patch_shape=PATCH_SHAPE)
    logits = mg.apply(variables, ids, video_patch_shape=PATCH_SHAPE)
    assert logits.shape == (1, 8, 64)


def test_token_critic_shapes():
    tc = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=32, depth=1, heads=2, dim_head=16,
        has_cross_attn=True, dim_context=24,
    )
    ids = jnp.zeros((2, 8), jnp.int32)
    ctx = jnp.zeros((2, 5, 24))
    variables = tc.init(
        jax.random.PRNGKey(0), ids, video_patch_shape=PATCH_SHAPE, context=ctx
    )
    scores = tc.apply(variables, ids, video_patch_shape=PATCH_SHAPE, context=ctx)
    assert scores.shape == (2, 8)
    cfg = tc.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        cond_scale=2.0,
        method=TokenCritic.forward_with_cond_scale,
    )
    assert cfg.shape == (2, 8)


def test_self_critic_shares_trunk(mg_and_vars):
    mg, variables = mg_and_vars
    sc = SelfCritic(mg)
    ids = jnp.zeros((2, 8), jnp.int32)
    ctx = jnp.zeros((2, 5, 24))
    sc_vars = sc.init(
        jax.random.PRNGKey(5), ids, video_patch_shape=PATCH_SHAPE, context=ctx
    )
    # the trunk params inside SelfCritic have the maskgit param structure
    # (minus to_logits, which return_embeds=True never touches)
    assert set(sc_vars["params"].keys()) == {"maskgit", "to_pred"}
    trunk_keys = set(sc_vars["params"]["maskgit"].keys())
    assert trunk_keys == set(variables["params"].keys()) - {"to_logits"}
    # swap in the trained maskgit params: outputs must track the shared trunk
    merged = {"params": {"maskgit": variables["params"], "to_pred": sc_vars["params"]["to_pred"]}}
    scores = sc.apply(merged, ids, video_patch_shape=PATCH_SHAPE, context=ctx)
    assert scores.shape == (2, 8)


def test_embeds_cfg_combine_equals_logits_cfg(mg_and_vars):
    """CFG combined in embedding space then projected must equal the
    logits-space combine exactly (the output head is affine)."""
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(5), (2, 8), 0, 65)
    ctx = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 24))
    mask = jnp.ones((2, 5), bool)

    ref = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=mask,
        cond_scale=4.0,
        method=MaskGit.forward_with_cond_scale,
    )
    h = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        text_mask=mask,
        cond_scale=4.0,
        method=MaskGit.embeds_with_cond_scale,
    )
    proj = variables["params"]["to_logits"]
    got = h @ proj["kernel"] + proj["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_embeds_cfg_scale_one_is_plain_embeds(mg_and_vars):
    mg, variables = mg_and_vars
    ids = jax.random.randint(jax.random.PRNGKey(7), (2, 8), 0, 65)
    ctx = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 24))

    h1 = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        cond_scale=1.0,
        method=MaskGit.embeds_with_cond_scale,
    )
    h2 = mg.apply(
        variables,
        ids,
        video_patch_shape=PATCH_SHAPE,
        context=ctx,
        return_embeds=True,
    )
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-6)
