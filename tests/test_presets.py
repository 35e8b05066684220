"""Flagship presets: shapes, parameter-count equality of the two head
shapes, and that the builders compose into a working Phenaki.

The tpu_native=True claim (same parameter budget as the reference's
8 x d_head=64 at 4 x d_head=128) is what BASELINE.md's d_head=128 rows
rest on — verified here by initializing both shapes and comparing leaf
sizes, on a dim-reduced config so the quick tier stays fast.
"""

import jax
import jax.numpy as jnp
import pytest

from phenaki_tpu.presets import (
    FLAGSHIP_NUM_FRAMES,
    flagship_cvivit,
    flagship_maskgit,
    flagship_phenaki,
    flagship_token_critic,
)


def test_flagship_cvivit_token_grid():
    cv = flagship_cvivit()
    assert cv.image_size == (256, 128)
    assert cv.num_tokens_per_frames(FLAGSHIP_NUM_FRAMES) == 1152
    assert cv.codebook_size == 65536


def test_flagship_maskgit_shapes():
    ref = flagship_maskgit()
    tpu = flagship_maskgit(tpu_native=True)
    assert (ref.heads, ref.dim_head) == (8, 64)
    assert (tpu.heads, tpu.dim_head) == (4, 128)
    # identical inner width => identical projection shapes and params
    assert ref.heads * ref.dim_head == tpu.heads * tpu.dim_head == 512
    assert ref.dim == tpu.dim and ref.depth == tpu.depth


def test_head_shapes_same_param_budget():
    """The two head shapes share every projection size; the ONLY leaves
    that differ belong to the CPB bias MLP (whose hidden width follows
    d_head and whose output is per-head) — ~0.01% of the flagship.
    Verified by diffing leaf-by-leaf."""

    def leaf_sizes(tpu_native):
        m = flagship_maskgit(
            tpu_native=tpu_native,
            # dim-reduced so init is cheap; head shapes untouched
            dim=64,
            num_tokens=256,
            max_seq_len=16,
            depth=1,
            scan_layers=False,
            dtype=jnp.float32,
        )
        params = m.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16), jnp.int32),
            video_patch_shape=(1, 4, 4),
            context=jnp.zeros((1, 5, 768), jnp.float32),
        )
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        return {jax.tree_util.keystr(k): v.size for k, v in flat}

    ref, tpu = leaf_sizes(False), leaf_sizes(True)
    assert ref.keys() == tpu.keys()
    # leaves whose size legitimately follows d_head, all tiny: the CPB bias
    # MLP (width = dim_head, reference attention.py CPB) and the per-channel
    # QK-norm scales (dim_head,)
    allowed = ("continuous_pos_bias", "q_scale", "k_scale")
    for key in ref:
        if ref[key] != tpu[key]:
            assert any(a in key for a in allowed), (
                f"unexpected shape-dependent params at {key}"
            )
    n_ref, n_tpu = sum(ref.values()), sum(tpu.values())
    assert abs(n_ref - n_tpu) / n_ref < 0.02  # tiny even at dim=64


def test_flagship_token_critic_is_conditional():
    critic = flagship_token_critic()
    assert critic.has_cross_attn


@pytest.mark.slow
def test_flagship_phenaki_builds_and_inits():
    ph = flagship_phenaki(jax.random.PRNGKey(0))
    assert ph.params is not None
    n = sum(x.size for x in jax.tree_util.tree_leaves(ph.params))
    assert n > 50_000_000  # flagship MaskGit is ~110M params
    assert ph.maskgit.max_seq_len == 1152
