"""Transformer block stack (reference attention.py:279-332).

Per layer: optional PEG (depthwise 3D conv over the token grid) -> self-attn
(additive bias + key-padding mask, optionally causal+ALiBi) -> optional
cross-attn over a context sequence (with null-KV for CFG robustness) -> GEGLU
FF; all residual. Final bias-less LayerNorm.

TPU notes: by default the layer loop is a Python loop over
distinct-parameter layers (unrolled at trace time). `scan_layers=True`
switches to `nn.scan` over stacked per-layer params — identical math, but the
compiled program contains ONE layer body instead of `depth` copies, which
cuts XLA compile time several-fold on this backend (the flagship train step
compiles in minutes unrolled). Param layout differs (leaf arrays gain a
leading `depth` axis under 'layers_scan'); `stack_layer_params` converts an
unrolled tree for equivalence testing / checkpoint migration. All matmuls run
in the module compute dtype (bf16 on TPU) with fp32 softmax/LN inside the
primitives.
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


class TransformerLayer(nn.Module):
    """One block: PEG? -> self-attn -> cross-attn? -> FF, all residual."""

    dim: int
    dim_context: Optional[int] = None
    causal: bool = False
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    peg: bool = False
    peg_causal: bool = False
    peg_layout: str = "thw"
    attn_num_null_kv: int = 2
    has_cross_attn: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    remat: bool = False
    # self-attn K/V from the pre-norm input (reference parity; see
    # ops/attention.py Attention.reference_self_kv)
    attn_reference_self_kv: bool = False
    # sequence parallelism: ring attention for SELF-attention over this mesh
    # axis (see ops/attention.py Attention.seq_shard_mesh)
    seq_shard_mesh: Optional[object] = None
    seq_shard_axis: Optional[str] = None
    # manual tensor parallelism (shard_map mode): this layer is the LOCAL
    # head/column shard — `heads` and `ff_inner_dim` are the per-rank sizes,
    # attention/FF outputs psum over this axis (ops/attention.py,
    # ops/feedforward.py; packing in parallel/tp_inference.py)
    tp_axis: Optional[str] = None
    # LOCAL GEGLU inner width (None = reference formula); set by the tp
    # packing since the reference width may not divide tp
    ff_inner_dim: Optional[int] = None
    # static over the scan; the (b, t, h, w) grid for PEG
    video_shape: Optional[Tuple[int, int, int, int]] = None
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        attn_bias: Optional[jax.Array],
        context: Optional[jax.Array],
        self_attn_mask: Optional[jax.Array],
        cross_attn_context_mask: Optional[jax.Array],
    ):
        attn_cls = Attention
        ff_cls = FeedForward
        if self.remat:
            # deterministic (last positional arg) must stay static under remat
            attn_cls = nn.remat(Attention, static_argnums=(5,))
            ff_cls = nn.remat(FeedForward, static_argnums=(2,))

        if self.peg:
            x = (
                PEG(
                    self.dim,
                    causal=self.peg_causal,
                    layout=self.peg_layout,
                    dtype=self.dtype,
                    name="peg",
                )(x, shape=self.video_shape)
                + x
            )

        # all-positional calls: nn.remat's static_argnums addresses
        # positional indices only
        x = (
            attn_cls(
                dim=self.dim,
                dim_head=self.dim_head,
                heads=self.heads,
                causal=self.causal,
                dropout=self.attn_dropout,
                reference_self_kv=self.attn_reference_self_kv,
                seq_shard_mesh=self.seq_shard_mesh,
                seq_shard_axis=self.seq_shard_axis,
                tp_axis=self.tp_axis,
                dtype=self.dtype,
                name="self_attn",
            )(x, self_attn_mask, None, attn_bias, self.deterministic)
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
                    tp_axis=self.tp_axis,
                    dtype=self.dtype,
                    name="cross_attn",
                )(x, cross_attn_context_mask, context, None, self.deterministic)
                + x
            )

        x = (
            ff_cls(
                dim=self.dim,
                mult=self.ff_mult,
                dropout=self.ff_dropout,
                inner_dim=self.ff_inner_dim,
                tp_axis=self.tp_axis,
                dtype=self.dtype,
                name="ff",
            )(x, self.deterministic)
            + x
        )
        return x


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
    # self-attn K/V from the pre-norm input (reference-checkpoint parity)
    attn_reference_self_kv: bool = False
    # sequence parallelism: self-attention runs as ring attention with q/k/v
    # sharded on the sequence over this mesh axis (long scenes — the token
    # sequence never lives whole on one chip). See ops/attention.py.
    seq_shard_mesh: Optional[object] = None
    seq_shard_axis: Optional[str] = None
    # manual tensor parallelism + local GEGLU width (see TransformerLayer)
    tp_axis: Optional[str] = None
    ff_inner_dim: Optional[int] = None
    # rematerialize attention/FF activations in the backward pass — trades
    # ~30% more FLOPs for O(depth) less activation HBM (jax.checkpoint;
    # the reference has no equivalent, large configs rely on it on TPU)
    remat: bool = False
    # ONE compiled layer body via nn.scan over stacked params (same math,
    # several-fold faster XLA compiles; param tree layout changes)
    scan_layers: bool = False
    dtype: jnp.dtype = jnp.float32

    def _layer_config(self, video_shape, deterministic) -> dict:
        return dict(
            dim=self.dim,
            dim_context=self.dim_context,
            causal=self.causal,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            peg=self.peg,
            peg_causal=self.peg_causal,
            peg_layout=self.peg_layout,
            attn_num_null_kv=self.attn_num_null_kv,
            has_cross_attn=self.has_cross_attn,
            attn_dropout=self.attn_dropout,
            ff_dropout=self.ff_dropout,
            remat=self.remat,
            attn_reference_self_kv=self.attn_reference_self_kv,
            seq_shard_mesh=self.seq_shard_mesh,
            seq_shard_axis=self.seq_shard_axis,
            tp_axis=self.tp_axis,
            ff_inner_dim=self.ff_inner_dim,
            video_shape=video_shape,
            deterministic=deterministic,
            dtype=self.dtype,
        )

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
        cfg = self._layer_config(video_shape, deterministic)

        if self.scan_layers:
            def body(layer_mod, carry, *broadcast):
                return layer_mod(carry, *broadcast), None

            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                length=self.depth,
                in_axes=nn.broadcast,
            )
            x, _ = scanned(
                TransformerLayer(**cfg, name="layers_scan"),
                x,
                attn_bias,
                context,
                self_attn_mask,
                cross_attn_context_mask,
            )
        else:
            for layer in range(self.depth):
                x = TransformerLayer(**cfg, name=f"layers_{layer}")(
                    x,
                    attn_bias,
                    context,
                    self_attn_mask,
                    cross_attn_context_mask,
                )

        return LayerNorm(self.dim, dtype=self.dtype, name="norm_out")(x)


def stack_layer_params(unrolled: dict, depth: int) -> dict:
    """Convert an unrolled Transformer param subtree ('layers_0'..'layers_N-1',
    'norm_out') to the scan layout ('layers_scan' with a leading depth axis).
    Used for equivalence tests and for migrating checkpoints between modes."""
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0),
        *[unrolled[f"layers_{i}"] for i in range(depth)],
    )
    out = {k: v for k, v in unrolled.items() if not k.startswith("layers_")}
    out["layers_scan"] = stacked
    return out
