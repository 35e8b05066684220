"""Numerical parity against the ACTUAL reference implementation.

Builds reference phenaki-pytorch modules (torch, CPU) with random weights,
converts their state_dicts through phenaki_tpu/convert.py, and asserts both
implementations produce the same numbers. This validates the converter AND
the reimplementation (attention math, CPB/ALiBi, patch plumbing, grad-shrink
forward, transformer order) in one shot.

The reference's unavailable deps are stubbed (tests/_reference_stubs.py) —
stubs are inert; every compared number comes from the reference's own code.
"""

import numpy as np
import pytest

from _reference_stubs import install_reference_stubs

_HAS_REF = install_reference_stubs()

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not _HAS_REF, reason="reference checkout not available"
    ),
]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from phenaki_tpu.convert import (  # noqa: E402
    convert_cvivit_state_dict,
    convert_maskgit_state_dict,
    convert_token_critic_state_dict,
)

ATOL = 2e-4
RTOL = 2e-4


def _allclose(ours, theirs):
    np.testing.assert_allclose(
        np.asarray(ours, np.float32),
        theirs.detach().cpu().numpy().astype(np.float32),
        atol=ATOL,
        rtol=RTOL,
    )


@pytest.mark.parametrize("scan_layers", [False, True])
def test_maskgit_forward_parity(scan_layers):
    import torch
    from phenaki_pytorch import MaskGit as RefMaskGit

    from phenaki_tpu.models.maskgit import MaskGit

    torch.manual_seed(0)
    ref = RefMaskGit(
        dim=64, num_tokens=256, max_seq_len=64, depth=2, heads=4,
        dim_head=16, dim_context=32,
    ).eval()

    ours = MaskGit(
        dim=64, num_tokens=256, max_seq_len=64, depth=2, heads=4,
        dim_head=16, dim_context=32, scan_layers=scan_layers,
        reference_attention_kv=True,
    )
    params = convert_maskgit_state_dict(ref.state_dict(), ours)

    rng = np.random.RandomState(1)
    ids = rng.randint(0, 257, size=(2, 24))  # includes mask_id rows
    ctx = rng.randn(2, 5, 32).astype(np.float32)
    tmask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=bool)
    patch_shape = (6, 2, 2)

    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(ids),
            video_patch_shape=patch_shape,
            context=torch.from_numpy(ctx),
            text_mask=torch.from_numpy(tmask),
        )

    got = ours.apply(
        {"params": params},
        jnp.asarray(ids),
        video_patch_shape=patch_shape,
        context=jnp.asarray(ctx),
        text_mask=jnp.asarray(tmask),
        deterministic=True,
    )
    _allclose(got, ref_logits)


def test_maskgit_video_mask_and_embeds_parity():
    import torch
    from phenaki_pytorch import MaskGit as RefMaskGit

    from phenaki_tpu.models.maskgit import MaskGit

    torch.manual_seed(2)
    ref = RefMaskGit(
        dim=32, num_tokens=64, max_seq_len=32, depth=1, heads=2,
        dim_head=16, dim_context=16,
    ).eval()
    ours = MaskGit(
        dim=32, num_tokens=64, max_seq_len=32, depth=1, heads=2,
        dim_head=16, dim_context=16, reference_attention_kv=True,
    )
    params = convert_maskgit_state_dict(ref.state_dict(), ours)

    rng = np.random.RandomState(3)
    ids = rng.randint(0, 65, size=(2, 8))
    ctx = rng.randn(2, 4, 16).astype(np.float32)
    vmask = np.array(
        [[1, 1, 1, 1, 1, 1, 0, 0], [1] * 8], dtype=bool
    )
    patch_shape = (2, 2, 2)

    with torch.no_grad():
        ref_emb = ref(
            torch.from_numpy(ids),
            video_patch_shape=patch_shape,
            context=torch.from_numpy(ctx),
            text_mask=torch.ones(2, 4, dtype=torch.bool),
            video_mask=torch.from_numpy(vmask),
            return_embeds=True,
        )
    got = ours.apply(
        {"params": params},
        jnp.asarray(ids),
        video_patch_shape=patch_shape,
        context=jnp.asarray(ctx),
        text_mask=jnp.ones((2, 4), bool),
        video_mask=jnp.asarray(vmask),
        return_embeds=True,
        deterministic=True,
    )
    _allclose(got, ref_emb)


def test_token_critic_parity():
    import torch
    from phenaki_pytorch import TokenCritic as RefTokenCritic

    from phenaki_tpu.models.maskgit import TokenCritic

    torch.manual_seed(4)
    ref = RefTokenCritic(
        dim=32, num_tokens=64, max_seq_len=32, depth=2, heads=2,
        dim_head=16, has_cross_attn=True, dim_context=16,
    ).eval()
    ours = TokenCritic(
        dim=32, num_tokens=64, max_seq_len=32, depth=2, heads=2,
        dim_head=16, has_cross_attn=True, dim_context=16,
        reference_attention_kv=True,
    )
    params = convert_token_critic_state_dict(ref.state_dict(), ours)

    rng = np.random.RandomState(5)
    ids = rng.randint(0, 64, size=(2, 8))
    ctx = rng.randn(2, 4, 16).astype(np.float32)

    with torch.no_grad():
        ref_scores = ref(
            torch.from_numpy(ids).reshape(2, 2, 2, 2),
            context=torch.from_numpy(ctx),
            text_mask=torch.ones(2, 4, dtype=torch.bool),
            cond_drop_prob=0.0,  # reference default None crashes on `> 0`
        )
    got = ours.apply(
        {"params": params},
        jnp.asarray(ids).reshape(2, 2, 2, 2),
        context=jnp.asarray(ctx),
        text_mask=jnp.ones((2, 4), bool),
        deterministic=True,
    )
    _allclose(got, ref_scores)


def test_cvivit_encode_decode_parity():
    """Patch embedding -> spatial+temporal encoder -> temporal+spatial
    decoder -> pixel heads, bypassing the (external-dep) quantizer on both
    sides. Exercises dual patch-norm, the 2-D CPB, causal temporal attention
    with ALiBi, and the causal PEG."""
    import torch
    from phenaki_pytorch import CViViT as RefCViViT

    from phenaki_tpu.models.cvivit import CViViT

    torch.manual_seed(6)
    ref = RefCViViT(
        dim=64, codebook_size=256, image_size=32, patch_size=8,
        temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
        dim_head=16, heads=4, use_vgg_and_gan=False,
    ).eval()
    ours = CViViT(
        dim=64, codebook_size=256, image_size=32, patch_size=8,
        temporal_patch_size=2, spatial_depth=2, temporal_depth=2,
        dim_head=16, heads=4,
        peg_reference_layout=True,  # reference-trained weights expect the
        # scrambled temporal-PEG stencil (attention.py:71)
        reference_attention_kv=True,  # and pre-norm self-attention K/V
    )
    params = convert_cvivit_state_dict(ref.state_dict(), ours, strict=True)

    rng = np.random.RandomState(7)
    video = rng.rand(2, 5, 32, 32, 3).astype(np.float32)  # (b, f, H, W, c)
    video_torch = torch.from_numpy(video.transpose(0, 4, 1, 2, 3))  # (b,c,f,H,W)

    with torch.no_grad():
        first, rest = video_torch[:, :, :1], video_torch[:, :, 1:]
        ref_tokens = torch.cat(
            (ref.to_patch_emb_first_frame(first), ref.to_patch_emb(rest)),
            dim=1,
        )  # (b, t, h, w, d)
        ref_enc = ref.encode(ref_tokens)
        ref_recon = ref.decode(ref_enc)  # (b, c, f, H, W)

    # ours needs the default-initialized vq subtree alongside the converted
    # encoder/decoder (the reference's quantizer lives in an external dep)
    variables = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32, 3)))
    merged = dict(variables["params"])
    merged.update(params)

    def run(m, v):
        tokens = m._to_patch_tokens(v)
        enc = m.encode(tokens)
        recon = m.decode(enc)
        return tokens, enc, recon

    tokens, enc, recon = ours.apply(
        {"params": merged}, jnp.asarray(video), method=run
    )

    _allclose(tokens, ref_tokens)
    _allclose(enc, ref_enc)
    # ours returns (b, f, H, W, c); reference (b, c, f, H, W)
    _allclose(recon.transpose(0, 4, 1, 2, 3), ref_recon)
