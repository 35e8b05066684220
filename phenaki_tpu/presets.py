"""Flagship model presets — the benchmark configs as first-class builders.

Two MaskGit head shapes are offered for the same parameter budget:

  * ``tpu_native=False`` (default): the reference's 8 heads x d_head=64
    (reference cvivit.py:238, phenaki_pytorch.py:236) — use this for weight
    conversion and numerical parity with pretrained torch checkpoints.
  * ``tpu_native=True``: 4 heads x d_head=128. Same parameter budget and
    FLOPs (QKV/out projections are (dim, heads*d_head) = (512, 512) either
    way; only the tiny CPB bias MLP differs — its width follows d_head —
    ~0.01% of the model), but the attention score/PV contractions run at
    depth 128,
    filling the MXU's full contraction depth instead of half of it.
    Measured on one v5e chip (BASELINE.md): sampling 221 -> 280 frames/s
    (25.4% -> 32.1% MFU), train loss fwd+bwd 44.1 -> 40.8 ms
    (20.1% -> 21.7% MFU), with no other change. Prefer it whenever you are
    training from scratch on TPU.

The C-ViViT preset matches the reference flagship: dim 512, 256x128
frames, patch 16 (16x8 token grid), temporal patch 2, 65536-entry LFQ
codebook — 17 frames tokenize to 9 latent frames = 1152 tokens.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .models.cvivit import CViViT
from .models.maskgit import MaskGit, TokenCritic
from .models.phenaki import Phenaki

FLAGSHIP_IMAGE_SIZE: Tuple[int, int] = (256, 128)
FLAGSHIP_NUM_FRAMES = 17
FLAGSHIP_TEXT_DIM = 768  # t5-v1_1-base encodings


def flagship_cvivit(*, dtype=jnp.bfloat16, **overrides) -> CViViT:
    """The benchmark C-ViViT tokenizer (reference README.md:94-108)."""
    cfg: Dict[str, Any] = dict(
        dim=512,
        codebook_size=65536,
        image_size=FLAGSHIP_IMAGE_SIZE,
        patch_size=16,
        temporal_patch_size=2,
        spatial_depth=4,
        temporal_depth=4,
        dim_head=64,
        heads=8,
        scan_layers=True,
        dtype=dtype,
    )
    cfg.update(overrides)
    return CViViT(**cfg)


def _head_shape(tpu_native: bool) -> Dict[str, int]:
    return dict(heads=4, dim_head=128) if tpu_native else dict(heads=8, dim_head=64)


def flagship_maskgit(
    *,
    tpu_native: bool = False,
    max_seq_len: int = 1152,
    dtype=jnp.bfloat16,
    **overrides,
) -> MaskGit:
    """The benchmark MaskGit trunk; see module docstring for `tpu_native`."""
    cfg: Dict[str, Any] = dict(
        dim=512,
        num_tokens=65536,
        max_seq_len=max_seq_len,
        depth=6,
        dim_context=FLAGSHIP_TEXT_DIM,
        scan_layers=True,
        dtype=dtype,
        **_head_shape(tpu_native),
    )
    cfg.update(overrides)
    return MaskGit(**cfg)


def flagship_token_critic(
    *,
    tpu_native: bool = False,
    max_seq_len: int = 1152,
    dtype=jnp.bfloat16,
    **overrides,
) -> TokenCritic:
    cfg: Dict[str, Any] = dict(
        dim=512,
        num_tokens=65536,
        max_seq_len=max_seq_len,
        depth=6,
        has_cross_attn=True,
        dim_context=FLAGSHIP_TEXT_DIM,
        scan_layers=True,
        dtype=dtype,
        **_head_shape(tpu_native),
    )
    cfg.update(overrides)
    return TokenCritic(**cfg)


def flagship_phenaki(
    rng: Optional[jax.Array] = None,
    *,
    tpu_native: bool = False,
    num_frames: int = FLAGSHIP_NUM_FRAMES,
    steps: int = 18,
    critic: bool = False,
    self_token_critic: bool = False,
    cvivit_vars: Optional[Dict[str, Any]] = None,
    dtype=jnp.bfloat16,
) -> Phenaki:
    """Build (and, when `rng` is given, jit-initialize) the flagship Phenaki.

    `cvivit_vars` lets a caller reuse already-trained/loaded tokenizer
    weights; otherwise fresh ones are initialized from `rng` (required).
    """
    from .utils.jit_init import jit_init

    cvivit = flagship_cvivit(dtype=dtype)
    if cvivit_vars is None:
        assert rng is not None, "pass rng= to initialize, or cvivit_vars="
        rng, init_rng = jax.random.split(rng)
        h, w = FLAGSHIP_IMAGE_SIZE
        cvivit_vars = jit_init(cvivit, init_rng, jnp.zeros((1, 3, h, w, 3), dtype))
    n_tokens = cvivit.num_tokens_per_frames(num_frames)
    maskgit = flagship_maskgit(
        tpu_native=tpu_native, max_seq_len=n_tokens, dtype=dtype
    )
    critic_model = (
        flagship_token_critic(
            tpu_native=tpu_native, max_seq_len=n_tokens, dtype=dtype
        )
        if critic
        else None
    )
    phenaki = Phenaki(
        maskgit=maskgit,
        cvivit=cvivit,
        cvivit_vars=cvivit_vars,
        critic=critic_model,
        self_token_critic=self_token_critic,
        steps=steps,
        text_embed_dim=FLAGSHIP_TEXT_DIM,
        max_text_len=128,
    )
    if rng is not None:
        phenaki.init(rng)
    return phenaki
