"""MaskGit, TokenCritic, and SelfCritic (reference phenaki_pytorch.py:105-336).

MaskGit: bidirectional transformer over the flattened video-token grid.
Token embedding includes an extra `mask_id = num_tokens` row; learned absolute
position embedding; gradient-shrink alpha=0.1 (CogView/GLM-130B trick);
3-D continuous position bias over the (t, h, w) patch grid; PEG; cross-attn
text conditioning with 2 null-KV pairs (unless unconditional); logits head.

Classifier-free guidance: the reference runs two forwards (cond + null,
phenaki_pytorch.py:149-161). Here `forward_with_cond_scale` stacks the cond
and null branches on the batch axis and runs ONE forward — twice the batch on
the MXU beats two launches, and it keeps the decode scan a single fused
program.

Conditioning dropout: the reference zeroes rows of the text mask
(phenaki_pytorch.py:188-190). Same here, driven by an explicit rng.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.models.transformer import Transformer
from phenaki_tpu.ops.positional import ContinuousPositionBias
from phenaki_tpu.ops.torch_init import (
    torch_bias_init,
    torch_embedding_init,
    torch_kernel_init,
)


class MaskGit(nn.Module):
    dim: int
    num_tokens: int
    max_seq_len: int
    gradient_shrink_alpha: float = 0.1
    heads: int = 8
    dim_head: int = 64
    depth: int = 6
    unconditional: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dim_context: Optional[int] = None
    remat: bool = False  # rematerialize layer activations (big configs)
    scan_layers: bool = False  # nn.scan over layers: faster compiles
    # self-attn K/V from the pre-norm input — set True when loading
    # converted reference checkpoints (phenaki_tpu/convert.py)
    reference_attention_kv: bool = False
    # sequence parallelism: self-attention over the (t*h*w) token sequence
    # runs as ring attention over this mesh axis (long scenes whose token
    # count outgrows one chip; see ops/attention.py seq_shard_mesh)
    seq_shard_mesh: Optional[object] = None
    seq_shard_axis: Optional[str] = None
    # manual tensor parallelism (shard_map mode): this instance is the LOCAL
    # head shard (heads = heads_global/tp, CPB emits local heads); attention/
    # FF outputs psum over the axis. Param slices come from
    # parallel/tp_inference.py; used by Phenaki's tp-sharded sampling.
    tp_axis: Optional[str] = None
    ff_inner_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def mask_id(self) -> int:
        return self.num_tokens

    def setup(self):
        # last token row is the mask_id (reference phenaki_pytorch.py:123-126)
        self.token_emb = nn.Embed(self.num_tokens + 1, self.dim, embedding_init=torch_embedding_init, dtype=self.dtype)
        self.pos_emb = nn.Embed(self.max_seq_len, self.dim, embedding_init=torch_embedding_init, dtype=self.dtype)
        self.continuous_pos_bias = ContinuousPositionBias(
            dim=self.dim_head, heads=self.heads, num_dims=3, dtype=self.dtype
        )
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            attn_num_null_kv=2,
            has_cross_attn=not self.unconditional,
            dim_head=self.dim_head,
            heads=self.heads,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            peg=True,
            dim_context=self.dim_context,
            remat=self.remat,
            scan_layers=self.scan_layers,
            attn_reference_self_kv=self.reference_attention_kv,
            seq_shard_mesh=self.seq_shard_mesh,
            seq_shard_axis=self.seq_shard_axis,
            tp_axis=self.tp_axis,
            ff_inner_dim=self.ff_inner_dim,
            dtype=self.dtype,
        )
        self.to_logits = nn.Dense(self.num_tokens, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype)

    def rel_pos_bias(self, video_patch_shape: Tuple[int, int, int]) -> jax.Array:
        """(heads, n, n) 3-D CPB bias for a static patch shape. Exposed so the
        decode scan can hoist the bias MLP out of the loop (it only depends on
        static shapes + params) instead of re-running it every step."""
        return self.continuous_pos_bias(*video_patch_shape)

    def __call__(
        self,
        x: jax.Array,  # (b, n) or (b, t, h, w) token ids
        *,
        video_patch_shape: Optional[Tuple[int, int, int]] = None,
        cond_drop_prob: float = 0.0,
        text_mask: Optional[jax.Array] = None,  # (b, m)
        video_mask: Optional[jax.Array] = None,  # (b, n)
        context: Optional[jax.Array] = None,  # (b, m, dim_context)
        attn_bias: Optional[jax.Array] = None,  # precomputed rel_pos_bias
        return_embeds: bool = False,
        deterministic: bool = True,
        pipeline_mesh=None,  # jax.sharding.Mesh with a 'pp' axis, or None
        pipeline_microbatches: Optional[int] = None,
    ) -> jax.Array:
        assert x.ndim in (2, 4), "token ids must be (b, n) or (b, t, h, w)"
        if x.ndim == 4:
            video_patch_shape = x.shape[1:]
            x = x.reshape(x.shape[0], -1)
        assert video_patch_shape is not None, "video patch shape must be given"

        b, n = x.shape
        assert n <= self.max_seq_len, (
            f"sequence length {n} exceeds max_seq_len {self.max_seq_len} —"
            " when sampling with prime frames, max_seq_len must cover the"
            " prime tokens plus the new scene's tokens"
        )

        rel_pos_bias = (
            attn_bias
            if attn_bias is not None
            else self.continuous_pos_bias(*video_patch_shape)
        )

        if context is not None and text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        if cond_drop_prob > 0 and text_mask is not None:
            # whole-sample conditioning dropout for CFG
            keep = jax.random.bernoulli(
                self.make_rng("cond_drop"), 1.0 - cond_drop_prob, (b,)
            )
            text_mask = text_mask & keep[:, None]

        video_shape = (b, *video_patch_shape)

        h = self.token_emb(x)
        h = h + self.pos_emb(jnp.arange(n))[None]

        # gradient shrink (reference phenaki_pytorch.py:131,199)
        a = self.gradient_shrink_alpha
        h = h * a + jax.lax.stop_gradient(h) * (1 - a)

        if pipeline_mesh is not None and not self.is_initializing():
            # GPipe pipeline over the trunk layers (parallel/pipeline.py):
            # the stacked scan_layers params are sharded over the mesh 'pp'
            # axis; math matches the sequential stack (dropout stream
            # differs by construction — see pipeline module docstring)
            from phenaki_tpu.parallel.pipeline import pipeline_transformer_apply

            drop_rng = None
            if not deterministic:
                drop_rng = self.make_rng("dropout")
            h = pipeline_transformer_apply(
                self.transformer,
                self.variables["params"]["transformer"],
                h,
                pipeline_mesh,
                num_microbatches=pipeline_microbatches,
                video_shape=video_shape,
                attn_bias=rel_pos_bias,
                context=context,
                self_attn_mask=video_mask,
                cross_attn_context_mask=text_mask,
                deterministic=deterministic,
                dropout_rng=drop_rng,
            )
        else:
            h = self.transformer(
                h,
                video_shape=video_shape,
                attn_bias=rel_pos_bias,
                context=context,
                self_attn_mask=video_mask,
                cross_attn_context_mask=text_mask,
                deterministic=deterministic,
            )

        if return_embeds:
            return h
        return self.to_logits(h)

    def forward_with_cond_scale(
        self,
        x: jax.Array,
        *,
        cond_scale: float = 3.0,
        text_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        combine: bool = True,
        **kwargs,
    ) -> jax.Array:
        """CFG: null + (cond - null) * scale, batched into one forward.

        With combine=False the STACKED (2b, n, vocab) logits are returned
        (first b = conditioned, last b = null) so a downstream consumer — the
        fused Pallas sampling kernel — can apply the combine without the
        split/recombine ever touching HBM."""
        if cond_scale == 1 or self.unconditional or context is None:
            return self(x, text_mask=text_mask, context=context, **kwargs)

        if text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        x2 = jnp.concatenate([x, x], axis=0)
        ctx2 = jnp.concatenate([context, context], axis=0)
        mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        vm = kwargs.pop("video_mask", None)
        if vm is not None:
            vm = jnp.concatenate([vm, vm], axis=0)

        logits2 = self(x2, text_mask=mask2, context=ctx2, video_mask=vm, **kwargs)
        if not combine:
            return logits2
        logits, null_logits = jnp.split(logits2, 2, axis=0)
        return null_logits + (logits - null_logits) * cond_scale

    def embeds_with_cond_scale(
        self,
        x: jax.Array,
        *,
        cond_scale: float = 3.0,
        text_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        """CFG combined in EMBEDDING space: (b, n, dim) final-norm embeddings.

        `to_logits` is affine, so `null + (cond - null) * s` applied to the
        embeddings yields exactly the CFG-combined logits after projection —
        at half the projection FLOPs of combining (2b, n, vocab) logits. The
        fused Pallas projection+sampling kernel consumes this directly, so the
        full-vocab logits never exist in HBM (reference runs CFG as two
        separate full-logits forwards, phenaki_pytorch.py:149-161)."""
        if cond_scale == 1 or self.unconditional or context is None:
            return self(
                x, text_mask=text_mask, context=context, return_embeds=True, **kwargs
            )

        if text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        x2 = jnp.concatenate([x, x], axis=0)
        ctx2 = jnp.concatenate([context, context], axis=0)
        mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        vm = kwargs.pop("video_mask", None)
        if vm is not None:
            vm = jnp.concatenate([vm, vm], axis=0)

        embeds2 = self(
            x2,
            text_mask=mask2,
            context=ctx2,
            video_mask=vm,
            return_embeds=True,
            **kwargs,
        )
        embeds, null_embeds = jnp.split(embeds2, 2, axis=0)
        return null_embeds + (embeds - null_embeds) * cond_scale


class TokenCritic(nn.Module):
    """Same trunk shape as MaskGit but a scalar per-token logit head
    (reference phenaki_pytorch.py:217-302)."""

    dim: int
    num_tokens: int
    max_seq_len: int
    has_cross_attn: bool = False
    heads: int = 8
    dim_head: int = 64
    depth: int = 6
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    dim_context: Optional[int] = None
    remat: bool = False
    scan_layers: bool = False
    reference_attention_kv: bool = False  # reference-checkpoint parity
    # manual tensor parallelism (see MaskGit.tp_axis)
    tp_axis: Optional[str] = None
    ff_inner_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @property
    def mask_id(self) -> int:
        return self.num_tokens

    def setup(self):
        self.token_emb = nn.Embed(self.num_tokens + 1, self.dim, embedding_init=torch_embedding_init, dtype=self.dtype)
        self.pos_emb = nn.Embed(self.max_seq_len, self.dim, embedding_init=torch_embedding_init, dtype=self.dtype)
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            peg=True,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            has_cross_attn=self.has_cross_attn,
            heads=self.heads,
            dim_head=self.dim_head,
            dim_context=self.dim_context,
            remat=self.remat,
            scan_layers=self.scan_layers,
            attn_reference_self_kv=self.reference_attention_kv,
            tp_axis=self.tp_axis,
            ff_inner_dim=self.ff_inner_dim,
            dtype=self.dtype,
        )
        self.to_logits = nn.Dense(1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.dim), dtype=self.dtype)

    def __call__(
        self,
        x: jax.Array,  # (b, n) or (b, t, h, w)
        *,
        video_patch_shape: Optional[Tuple[int, int, int]] = None,
        cond_drop_prob: float = 0.0,
        text_mask: Optional[jax.Array] = None,
        video_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        deterministic: bool = True,
        pipeline_mesh=None,  # jax.sharding.Mesh with a 'pp' axis, or None
        pipeline_microbatches: Optional[int] = None,
    ) -> jax.Array:
        if x.ndim == 4:
            video_patch_shape = x.shape[1:]
            x = x.reshape(x.shape[0], -1)
        b, n = x.shape

        if video_patch_shape is not None:
            video_shape = (b, *video_patch_shape)
        else:
            video_shape = None

        if context is not None and text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        if context is not None and cond_drop_prob > 0 and text_mask is not None:
            keep = jax.random.bernoulli(
                self.make_rng("cond_drop"), 1.0 - cond_drop_prob, (b,)
            )
            text_mask = text_mask & keep[:, None]

        h = self.token_emb(x)
        h = h + self.pos_emb(jnp.arange(n))[None]

        if pipeline_mesh is not None and not self.is_initializing():
            from phenaki_tpu.parallel.pipeline import pipeline_transformer_apply

            drop_rng = None
            if not deterministic:
                drop_rng = self.make_rng("dropout")
            h = pipeline_transformer_apply(
                self.transformer,
                self.variables["params"]["transformer"],
                h,
                pipeline_mesh,
                num_microbatches=pipeline_microbatches,
                video_shape=video_shape,
                attn_bias=None,
                context=context,
                self_attn_mask=video_mask,
                cross_attn_context_mask=text_mask,
                deterministic=deterministic,
                dropout_rng=drop_rng,
            )
        else:
            h = self.transformer(
                h,
                video_shape=video_shape,
                context=context,
                self_attn_mask=video_mask,
                cross_attn_context_mask=text_mask,
                deterministic=deterministic,
            )
        return self.to_logits(h)[..., 0]

    def forward_with_cond_scale(
        self,
        x: jax.Array,
        *,
        cond_scale: float = 3.0,
        text_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        if cond_scale == 1 or context is None or not self.has_cross_attn:
            return self(x, text_mask=text_mask, context=context, **kwargs)

        if text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        x2 = jnp.concatenate([x, x], axis=0)
        ctx2 = jnp.concatenate([context, context], axis=0)
        mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        vm = kwargs.pop("video_mask", None)
        if vm is not None:
            vm = jnp.concatenate([vm, vm], axis=0)

        logits2 = self(x2, text_mask=mask2, context=ctx2, video_mask=vm, **kwargs)
        logits, null_logits = jnp.split(logits2, 2, axis=0)
        return null_logits + (logits - null_logits) * cond_scale


class SelfCritic(nn.Module):
    """Reuses the MaskGit trunk (return_embeds) + a linear scalar head —
    zero extra transformer params (reference phenaki_pytorch.py:307-336).

    Share parameters by passing the *same* maskgit params under 'maskgit' in
    this module's param tree (Phenaki wires this up).
    """

    maskgit: MaskGit

    @nn.compact
    def __call__(self, x: jax.Array, *args, **kwargs) -> jax.Array:
        embeds = self.maskgit(x, *args, return_embeds=True, **kwargs)
        return nn.Dense(1, kernel_init=torch_kernel_init, bias_init=torch_bias_init(self.maskgit.dim), dtype=self.maskgit.dtype, name="to_pred")(embeds)[..., 0]

    def forward_with_cond_scale(
        self,
        x: jax.Array,
        *,
        cond_scale: float = 3.0,
        text_mask: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        **kwargs,
    ) -> jax.Array:
        if cond_scale == 1 or context is None or self.maskgit.unconditional:
            return self(x, text_mask=text_mask, context=context, **kwargs)

        if text_mask is None:
            text_mask = jnp.ones(context.shape[:2], dtype=bool)

        x2 = jnp.concatenate([x, x], axis=0)
        ctx2 = jnp.concatenate([context, context], axis=0)
        mask2 = jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0)
        vm = kwargs.pop("video_mask", None)
        if vm is not None:
            vm = jnp.concatenate([vm, vm], axis=0)

        logits2 = self(x2, text_mask=mask2, context=ctx2, video_mask=vm, **kwargs)
        logits, null_logits = jnp.split(logits2, 2, axis=0)
        return null_logits + (logits - null_logits) * cond_scale
