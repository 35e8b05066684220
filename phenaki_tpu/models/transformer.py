"""Transformer block stack (reference attention.py:279-332).

Per layer: optional PEG (depthwise 3D conv over the token grid) -> self-attn
(additive bias + key-padding mask, optionally causal+ALiBi) -> optional
cross-attn over a context sequence (with null-KV for CFG robustness) -> GEGLU
FF; all residual. Final bias-less LayerNorm.

TPU notes: the layer loop is a Python loop over distinct-parameter layers
(unrolled at trace time — depths here are <= ~8 so a lax.scan-over-layers
would only save compile time, not runtime). All matmuls run in the module
compute dtype (bf16 on TPU) with fp32 softmax/LN inside the primitives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.ops.attention import Attention
from phenaki_tpu.ops.feedforward import FeedForward
from phenaki_tpu.ops.norms import LayerNorm
from phenaki_tpu.ops.positional import PEG


class Transformer(nn.Module):
    dim: int
    depth: int
    dim_context: Optional[int] = None
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    peg: bool = False
    peg_causal: bool = False
    peg_layout: str = "thw"  # see PEG.layout
    attn_num_null_kv: int = 2
    has_cross_attn: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    # rematerialize attention/FF activations in the backward pass — trades
    # ~30% more FLOPs for O(depth) less activation HBM (jax.checkpoint;
    # the reference has no equivalent, large configs rely on it on TPU)
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (b, n, dim)
        video_shape: Optional[Tuple[int, int, int, int]] = None,  # (b, t, h, w)
        attn_bias: Optional[jax.Array] = None,  # (heads, n, n)
        context: Optional[jax.Array] = None,  # (b, m, dim_context)
        self_attn_mask: Optional[jax.Array] = None,  # (b, n)
        cross_attn_context_mask: Optional[jax.Array] = None,  # (b, m)
        deterministic: bool = True,
    ) -> jax.Array:
        attn_cls = Attention
        ff_cls = FeedForward
        if self.remat:
            # deterministic (last positional arg) must stay static under remat
            attn_cls = nn.remat(Attention, static_argnums=(5,))
            ff_cls = nn.remat(FeedForward, static_argnums=(2,))

        for layer in range(self.depth):
            if self.peg:
                x = (
                    PEG(
                        self.dim,
                        causal=self.peg_causal,
                        layout=self.peg_layout,
                        dtype=self.dtype,
                        name=f"layers_{layer}_peg",
                    )(x, shape=video_shape)
                    + x
                )

            # all-positional calls: nn.remat's static_argnums addresses
            # positional indices only (deterministic must stay static)
            x = (
                attn_cls(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    causal=self.causal,
                    dropout=self.attn_dropout,
                    dtype=self.dtype,
                    name=f"layers_{layer}_self_attn",
                )(x, self_attn_mask, None, attn_bias, deterministic)
                + x
            )

            if self.has_cross_attn and context is not None:
                x = (
                    attn_cls(
                        dim=self.dim,
                        dim_head=self.dim_head,
                        dim_context=self.dim_context,
                        heads=self.heads,
                        causal=False,
                        num_null_kv=self.attn_num_null_kv,
                        dropout=self.attn_dropout,
                        dtype=self.dtype,
                        name=f"layers_{layer}_cross_attn",
                    )(x, cross_attn_context_mask, context, None, deterministic)
                    + x
                )

            x = (
                ff_cls(
                    dim=self.dim,
                    mult=self.ff_mult,
                    dropout=self.ff_dropout,
                    dtype=self.dtype,
                    name=f"layers_{layer}_ff",
                )(x, deterministic)
                + x
            )

        return LayerNorm(self.dim, dtype=self.dtype, name="norm_out")(x)
