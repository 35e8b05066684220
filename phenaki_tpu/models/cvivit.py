"""C-ViViT: factorized spatial/temporal video tokenizer-autoencoder.

Reference: cvivit.py:226-671. Architecture:

  video (b, t, H, W, c)  [NTHWC — TPU-friendly channels-last]
    -> first-frame patch embed (1 x p x p) / rest-frames patch embed
       (pt x p x p), each with dual patch-norm (LN -> Dense -> LN,
       cvivit.py:273-285)
    -> encoder: spatial transformer per frame over (h*w) tokens with 2-D
       continuous position bias, then causal temporal transformer per spatial
       position over t tokens with PEG + ALiBi (cvivit.py:287-311,449-474)
    -> LFQ / cosine-VQ bottleneck over the flat (b, t*h*w, d) sequence
    -> decoder mirrors in reverse; separate to-pixels heads for first frame
       and rest frames (cvivit.py:323-334,476-516)

The discriminator and VGG live in separate modules/params (not submodules as
in the reference) so the two-optimizer GAN loop needs no parameter-set
surgery; see phenaki_tpu/models/cvivit_losses.py for the VQGAN loss suite.

Layout note: all APIs here take channels-last video (b, t, H, W, c). The
reference uses torch's (b, c, f, H, W); the data pipeline produces
channels-last directly — XLA on TPU wants the minor-most dimension to be the
one that feeds matmul lanes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.models.transformer import Transformer
from phenaki_tpu.ops.attention import Attention
from phenaki_tpu.ops.norms import StandardLayerNorm
from phenaki_tpu.ops.positional import ContinuousPositionBias
from phenaki_tpu.ops.quantize import LFQ, QuantizerOutput, VectorQuantize
from phenaki_tpu.ops.torch_init import torch_bias_init, torch_kernel_init


def pair(v):
    return (v, v) if not isinstance(v, tuple) else v


class CViViT(nn.Module):
    dim: int
    codebook_size: int
    image_size: int | Tuple[int, int]
    patch_size: int | Tuple[int, int]
    temporal_patch_size: int
    spatial_depth: int
    temporal_depth: int
    dim_head: int = 64
    heads: int = 8
    channels: int = 3
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    lookup_free_quantization: bool = True
    # LFQ aux-loss weights, passed through to ops/quantize.py LFQ (the
    # reference forwards lookup_free_quantization_kwargs the same way,
    # cvivit.py:319); set both weights to 0 to train pure-recon
    lfq_entropy_loss_weight: float = 0.1
    lfq_commitment_loss_weight: float = 0.25
    lfq_diversity_gamma: float = 1.0
    remat: bool = False  # rematerialize transformer activations (big configs)
    scan_layers: bool = False  # nn.scan over layers: faster compiles
    # temporal-PEG grid layout. False (default): the intended causal conv
    # over the real (t, h, w) grid ('bhw_t'). True: replicate the reference
    # quirk (attention.py:71) that reshapes the flat (b*h*w, t, d) temporal
    # sequence directly as (b, t, h, w, d), scrambling the grid — REQUIRED
    # when loading reference checkpoints (convert.py), whose trained weights
    # expect the scrambled stencil.
    peg_reference_layout: bool = False
    # self-attn K/V from the pre-norm input (reference quirk,
    # attention.py:138-142) — set True, with peg_reference_layout=True,
    # when loading converted reference checkpoints
    reference_attention_kv: bool = False
    # sequence parallelism for the TEMPORAL transformers: self-attention over
    # the frame axis runs as ring attention over this mesh axis (long scenes;
    # see ops/attention.py seq_shard_mesh). Spatial attention stays dense
    # (hw tokens per frame are small).
    seq_shard_mesh: Optional[object] = None
    seq_shard_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    # ------------------------------------------------------------------ #
    # token-count / patch-shape arithmetic (reference cvivit.py:365-410) #
    # ------------------------------------------------------------------ #

    @property
    def image_hw(self) -> Tuple[int, int]:
        return pair(self.image_size)

    @property
    def patch_hw(self) -> Tuple[int, int]:
        return pair(self.patch_size)

    @property
    def patch_height_width(self) -> Tuple[int, int]:
        ih, iw = self.image_hw
        ph, pw = self.patch_hw
        return ih // ph, iw // pw

    @property
    def image_num_tokens(self) -> int:
        h, w = self.patch_height_width
        return h * w

    def get_video_patch_shape(
        self, num_frames: int, include_first_frame: bool = True
    ) -> Tuple[int, int, int]:
        patch_frames = 0
        if include_first_frame:
            num_frames -= 1
            patch_frames += 1
        patch_frames += num_frames // self.temporal_patch_size
        return (patch_frames, *self.patch_height_width)

    def num_tokens_per_frames(
        self, num_frames: int, include_first_frame: bool = True
    ) -> int:
        tokens_per_frame = self.image_num_tokens
        total = 0
        if include_first_frame:
            num_frames -= 1
            total += tokens_per_frame
        assert num_frames % self.temporal_patch_size == 0, (
            f"number of frames after the first ({num_frames}) must be divisible"
            f" by temporal_patch_size ({self.temporal_patch_size}); use"
            f" 1 + k*{self.temporal_patch_size} total frames for unprimed"
            f" scenes, or a multiple of {self.temporal_patch_size} new frames"
            " for primed scenes"
        )
        return total + (num_frames // self.temporal_patch_size) * tokens_per_frame

    def frames_per_num_tokens(self, num_tokens: int) -> int:
        # reference cvivit.py:390-397 has a NameError here (quirk Q2);
        # this is the intended behavior
        tokens_per_frame = self.image_num_tokens
        assert num_tokens % tokens_per_frame == 0 and num_tokens > 0
        pseudo_frames = num_tokens // tokens_per_frame
        return (pseudo_frames - 1) * self.temporal_patch_size + 1

    def calculate_video_token_mask(self, video_frame_mask: jax.Array) -> jax.Array:
        """(b, f) frame mask -> (b, latent_f * h * w) token mask
        (reference cvivit.py:365-373; first frame counted separately)."""
        first = video_frame_mask[:, :1]
        rest = video_frame_mask[:, 1:]
        b = rest.shape[0]
        rest = rest.reshape(b, -1, self.temporal_patch_size)
        frame_mask = jnp.concatenate([first, jnp.any(rest, axis=-1)], axis=-1)
        hw = self.image_num_tokens
        return jnp.repeat(frame_mask, hw, axis=-1)

    # ----------------- #
    # module definition #
    # ----------------- #

    def setup(self):
        ph, pw = self.patch_hw
        c, pt = self.channels, self.temporal_patch_size

        self.spatial_rel_pos_bias = ContinuousPositionBias(
            dim=self.dim, heads=self.heads, num_dims=2, dtype=self.dtype
        )

        # dual patch-norm embeddings (reference cvivit.py:273-285)
        self.patch_norm_in_first = StandardLayerNorm(c * ph * pw, dtype=self.dtype)
        self.patch_proj_first = nn.Dense(self.dim, kernel_init=torch_kernel_init, bias_init=torch_bias_init(c * ph * pw), dtype=self.dtype)
        self.patch_norm_out_first = StandardLayerNorm(self.dim, dtype=self.dtype)

        self.patch_norm_in_rest = StandardLayerNorm(c * ph * pw * pt, dtype=self.dtype)
        self.patch_proj_rest = nn.Dense(self.dim, kernel_init=torch_kernel_init, bias_init=torch_bias_init(c * ph * pw * pt), dtype=self.dtype)
        self.patch_norm_out_rest = StandardLayerNorm(self.dim, dtype=self.dtype)

        spatial_kwargs = dict(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            causal=False,
            peg=False,
            remat=self.remat,
            scan_layers=self.scan_layers,
            attn_reference_self_kv=self.reference_attention_kv,
            dtype=self.dtype,
        )
        # only temporal transformers have PEG and are causal (cvivit.py:297-308)
        temporal_kwargs = dict(
            dim=self.dim,
            dim_head=self.dim_head,
            heads=self.heads,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            causal=True,
            peg=True,
            peg_causal=True,
            # sequence axis is time, batch folds space; 'thw' on this flat
            # layout reproduces the reference's scrambled-grid stencil
            peg_layout="thw" if self.peg_reference_layout else "bhw_t",
            remat=self.remat,
            scan_layers=self.scan_layers,
            attn_reference_self_kv=self.reference_attention_kv,
            seq_shard_mesh=self.seq_shard_mesh,
            seq_shard_axis=self.seq_shard_axis,
            dtype=self.dtype,
        )

        self.enc_spatial_transformer = Transformer(depth=self.spatial_depth, **spatial_kwargs)
        self.enc_temporal_transformer = Transformer(depth=self.temporal_depth, **temporal_kwargs)
        self.dec_spatial_transformer = Transformer(depth=self.spatial_depth, **spatial_kwargs)
        self.dec_temporal_transformer = Transformer(depth=self.temporal_depth, **temporal_kwargs)

        if self.lookup_free_quantization:
            self.vq = LFQ(
                dim=self.dim,
                codebook_size=self.codebook_size,
                entropy_loss_weight=self.lfq_entropy_loss_weight,
                commitment_loss_weight=self.lfq_commitment_loss_weight,
                diversity_gamma=self.lfq_diversity_gamma,
                dtype=self.dtype,
            )
        else:
            self.vq = VectorQuantize(
                dim=self.dim, codebook_size=self.codebook_size, dtype=self.dtype
            )

        self.to_pixels_first = nn.Dense(c * ph * pw, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype)
        self.to_pixels_rest = nn.Dense(c * ph * pw * pt, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype)

    # -------------- #
    # patch plumbing #
    # -------------- #

    def _to_patch_tokens(self, video: jax.Array) -> jax.Array:
        """(b, f, H, W, c) -> (b, t, h, w, dim) with t = 1 + (f-1)/pt."""
        b, f, H, W, c = video.shape
        ph, pw = self.patch_hw
        pt = self.temporal_patch_size
        h, w = self.patch_height_width

        first = video[:, :1]  # (b, 1, H, W, c)
        rest = video[:, 1:]  # (b, f-1, H, W, c)

        # first frame: 1 x p x p patches
        x = first.reshape(b, 1, h, ph, w, pw, c)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5).reshape(b, 1, h, w, c * ph * pw)
        x = self.patch_norm_out_first(self.patch_proj_first(self.patch_norm_in_first(x)))

        # rest frames: pt x p x p patches
        t = (f - 1) // pt
        y = rest.reshape(b, t, pt, h, ph, w, pw, c)
        y = y.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, t, h, w, c * pt * ph * pw)
        y = self.patch_norm_out_rest(self.patch_proj_rest(self.patch_norm_in_rest(y)))

        return jnp.concatenate([x, y], axis=1)

    def _to_pixels(self, tokens: jax.Array) -> jax.Array:
        """(b, t, h, w, dim) -> (b, f, H, W, c) mirroring _to_patch_tokens."""
        b, t, h, w, _ = tokens.shape
        ph, pw = self.patch_hw
        pt = self.temporal_patch_size
        c = self.channels

        first = self.to_pixels_first(tokens[:, :1]).reshape(b, 1, h, w, c, ph, pw)
        first = jnp.einsum("bthwcpq->bthpwqc", first).reshape(b, 1, h * ph, w * pw, c)

        rest = self.to_pixels_rest(tokens[:, 1:]).reshape(b, t - 1, h, w, c, pt, ph, pw)
        rest = jnp.einsum("bthwcspq->btshpwqc", rest).reshape(
            b, (t - 1) * pt, h * ph, w * pw, c
        )

        return jnp.concatenate([first, rest], axis=1)

    # ---------------- #
    # encode / decode  #
    # ---------------- #

    def encode(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        """Spatial then causal-temporal encoding (reference cvivit.py:449-474).

        tokens: (b, t, h, w, d) -> (b, t, h, w, d)
        """
        b, t, h, w, d = tokens.shape
        video_shape = (b, t, h, w)

        attn_bias = self.spatial_rel_pos_bias(h, w)

        x = tokens.reshape(b * t, h * w, d)
        x = self.enc_spatial_transformer(
            x, attn_bias=attn_bias, video_shape=video_shape, deterministic=deterministic
        )
        x = x.reshape(b, t, h, w, d)

        x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = self.enc_temporal_transformer(
            x, video_shape=video_shape, deterministic=deterministic
        )
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)
        return x

    def decode_tokens(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        """Temporal then spatial decode transformers, pre-pixel-head
        (reference cvivit.py:488-504). Exposed separately so the adaptive
        generator-loss weight can differentiate the pixel heads alone.

        tokens: (b, t, h, w, d) or (b, t*h*w, d) -> (b, t, h, w, d)
        """
        h, w = self.patch_height_width
        if tokens.ndim == 3:
            b, n, d = tokens.shape
            tokens = tokens.reshape(b, n // (h * w), h, w, d)
        b, t, _, _, d = tokens.shape
        video_shape = (b, t, h, w)

        x = tokens.transpose(0, 2, 3, 1, 4).reshape(b * h * w, t, d)
        x = self.dec_temporal_transformer(
            x, video_shape=video_shape, deterministic=deterministic
        )
        x = x.reshape(b, h, w, t, d).transpose(0, 3, 1, 2, 4)

        attn_bias = self.spatial_rel_pos_bias(h, w)
        x = x.reshape(b * t, h * w, d)
        x = self.dec_spatial_transformer(
            x, attn_bias=attn_bias, video_shape=video_shape, deterministic=deterministic
        )
        return x.reshape(b, t, h, w, d)

    def to_pixels(self, tokens: jax.Array) -> jax.Array:
        """Pixel heads: (b, t, h, w, d) -> video (b, f, H, W, c)."""
        return self._to_pixels(tokens)

    def decode(self, tokens: jax.Array, deterministic: bool = True) -> jax.Array:
        """Full decode (reference cvivit.py:476-516)."""
        return self._to_pixels(self.decode_tokens(tokens, deterministic=deterministic))

    def decode_from_codebook_indices(self, indices: jax.Array) -> jax.Array:
        """indices (b, n) or (b, t, h, w) -> video (reference cvivit.py:437-443)."""
        if indices.ndim == 4:
            indices = indices.reshape(indices.shape[0], -1)
        if self.lookup_free_quantization:
            codes = self.vq.indices_to_codes(indices)
        else:
            codes = self.vq.codebook_lookup(indices)
        return self.decode(codes)

    # ------------- #
    # full forward  #
    # ------------- #

    def forward_intermediates(
        self,
        video: jax.Array,
        mask: Optional[jax.Array] = None,
        deterministic: bool = True,
        update_codebook: bool = False,
    ) -> dict:
        """Full forward returning intermediates the VQGAN loss suite needs
        (notably `dec_tokens`, the pre-pixel-head decoder output, for the
        adaptive generator weight — reference cvivit.py:654-662)."""
        is_image = video.ndim == 4
        if is_image:
            video = video[:, None]
            assert mask is None

        b, f, H, W, c = video.shape
        assert (H, W) == self.image_hw, f"expected {self.image_hw}, got {(H, W)}"
        assert (f - 1) % self.temporal_patch_size == 0, (
            f"frames ({f}) minus one must be divisible by temporal patch size"
            f" ({self.temporal_patch_size})"
        )

        tokens = self._to_patch_tokens(video)
        _, t, h, w, d = tokens.shape

        tokens = self.encode(tokens, deterministic=deterministic)

        flat = tokens.reshape(b, t * h * w, d)

        vq_mask = None
        if mask is not None:
            vq_mask = self.calculate_video_token_mask(mask)

        if self.lookup_free_quantization:
            quantized, indices, vq_aux_loss = self.vq(flat, mask=vq_mask)
        else:
            quantized, indices, vq_aux_loss = self.vq(
                flat, mask=vq_mask, update_codebook=update_codebook
            )

        dec_tokens = self.decode_tokens(
            quantized.reshape(b, t, h, w, d), deterministic=deterministic
        )
        recon_video = self._to_pixels(dec_tokens)
        if is_image:
            recon_video = recon_video[:, 0]

        return dict(
            recon_video=recon_video,
            indices=indices.reshape(b, t, h, w),
            vq_aux_loss=vq_aux_loss,
            dec_tokens=dec_tokens,
            is_image=is_image,
        )

    def __call__(
        self,
        video: jax.Array,
        mask: Optional[jax.Array] = None,
        return_only_codebook_ids: bool = False,
        deterministic: bool = True,
        update_codebook: bool = False,
    ):
        """video: (b, f, H, W, c) or image (b, H, W, c).

        Returns (recon_video, indices, vq_aux_loss); or just indices when
        `return_only_codebook_ids` (reference cvivit.py:518-583). Loss
        composition lives in cvivit_losses.py.
        """
        out = self.forward_intermediates(
            video,
            mask=mask,
            deterministic=deterministic,
            update_codebook=update_codebook,
        )
        if return_only_codebook_ids:
            return out["indices"]
        return out["recon_video"], out["indices"], out["vq_aux_loss"]

    def tokenize(self, video: jax.Array) -> jax.Array:
        """Video -> codebook ids (b, t, h, w); eval-mode convenience."""
        return self(video, return_only_codebook_ids=True)


# --------------------------------------------------------------------------- #
# StyleGAN-ish frame discriminator (reference cvivit.py:107-213)              #
# --------------------------------------------------------------------------- #


class DiscriminatorBlock(nn.Module):
    filters: int
    downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (b, H, W, c) NHWC."""
        in_ch = x.shape[-1]
        res = nn.Conv(
            self.filters,
            (1, 1),
            strides=(2, 2) if self.downsample else (1, 1),
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(in_ch),
            dtype=self.dtype,
            name="conv_res",
        )(x)

        x = nn.Conv(self.filters, (3, 3), padding=1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(in_ch * 9), dtype=self.dtype, name="conv1")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = nn.Conv(self.filters, (3, 3), padding=1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.filters * 9), dtype=self.dtype, name="conv2")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)

        if self.downsample:
            # space-to-depth then 1x1 conv (reference cvivit.py:124-127)
            b, H, W, c = x.shape
            x = x.reshape(b, H // 2, 2, W // 2, 2, c)
            x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, H // 2, W // 2, c * 4)
            x = nn.Conv(self.filters, (1, 1), kernel_init=torch_kernel_init, bias_init=torch_bias_init(c * 4), dtype=self.dtype, name="conv_down")(x)

        return (x + res) * (1 / math.sqrt(2))


class Discriminator(nn.Module):
    dim: int
    image_size: int | Tuple[int, int]
    channels: int = 3
    attn_res_layers: Tuple[int, ...] = (16,)
    max_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, return_features: bool = False):
        """x: (b, H, W, c) single frames -> (b,) logits.

        With `return_features=True` also returns the per-block activations
        (list of (b, h, w, c) maps) — the feature stack behind the
        discriminator-feature perceptual loss (cvivit_losses.py
        `perceptual_mode='disc'`), an in-training substitute for the
        reference's pretrained-VGG features (cvivit.py:345-351)."""
        image_size = pair(self.image_size)
        min_res = min(image_size)
        num_layers = int(math.log2(min_res) - 2)

        layer_dims = [self.channels] + [
            min((self.dim * 4) * (2**i), self.max_dim) for i in range(num_layers + 1)
        ]
        pairs = list(zip(layer_dims[:-1], layer_dims[1:]))

        features = []
        resolution = min_res
        for ind, (_, out_chan) in enumerate(pairs):
            is_not_last = ind != (len(pairs) - 1)
            x = DiscriminatorBlock(
                out_chan, downsample=is_not_last, dtype=self.dtype, name=f"block_{ind}"
            )(x)
            if resolution in self.attn_res_layers:
                b, H, W, c = x.shape
                flat = x.reshape(b, H * W, c)
                flat = (
                    Attention(
                        dim=c,
                        use_flash=False,  # R1 penalty needs 2nd-order grads
                        dtype=self.dtype,
                        name=f"attn_{ind}",
                    )(flat)
                    + flat
                )
                x = flat.reshape(b, H, W, c)
            features.append(x)
            resolution //= 2

        x = nn.Conv(x.shape[-1], (3, 3), padding=1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(x.shape[-1] * 9), dtype=self.dtype, name="to_logits_conv")(x)
        x = nn.leaky_relu(x, negative_slope=0.1)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(x.shape[-1]), dtype=self.dtype, name="to_logits")(x)
        if return_features:
            return x[:, 0], features
        return x[:, 0]
