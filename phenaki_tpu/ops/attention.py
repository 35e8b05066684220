"""QK-L2-norm cosine attention (SwinV2-style, fixed scale) with null-KV,
additive bias, key-padding masks, and causal+ALiBi support.

Reference: attention.py:89-182. This is the single hottest op in the stack —
every transformer (C-ViViT spatial/temporal, MaskGit, TokenCritic,
discriminator attention) routes through `qk_norm_attention`. The functional
core is kept separate from the flax module so a fused Pallas kernel can be
swapped in behind the same interface (see phenaki_tpu/ops/pallas_attention.py).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from phenaki_tpu.ops.norms import LayerNorm, l2norm, l2norm_scaled
from phenaki_tpu.ops.torch_init import torch_kernel_init
from phenaki_tpu.ops.positional import alibi_bias

NEG_INF = -1e30


class _ProjKernel(nn.Module):
    """Parameter holder mirroring nn.Dense's {kernel} layout (no-bias dense).

    Lets Attention FUSE the q and kv projections into one matmul when they
    share an input (self-attention): x @ [Wq | Wkv] is one MXU launch instead
    of two, and its backward fuses dx = d(qkv) @ [Wq | Wkv]^T the same way.
    Param tree stays exactly {'to_q': {'kernel'}, 'to_kv': {'kernel'}} —
    checkpoints and converters are unaffected."""

    features: int
    dim_in: int

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", torch_kernel_init, (self.dim_in, self.features), jnp.float32
        )


def _use_flash(q, attn_bias, dropout_rate, deterministic) -> bool:
    """Route to the fused Pallas kernel when it applies: TPU backend (or test
    override), no attention dropout, per-head (unbatched) bias, dim_head that
    fits a VMEM block, and enough tokens for the kernel to matter."""
    from phenaki_tpu.ops import pallas_attention as pa

    if dropout_rate > 0.0 and not deterministic:
        return False
    if attn_bias is not None and attn_bias.ndim == 4:
        return False
    if q.shape[-1] > 128 or q.shape[-2] < 64:
        return False
    if pa._INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def qk_norm_attention(
    q: jax.Array,  # (b, h, i, d)
    k: jax.Array,  # (b, h, j, d)
    v: jax.Array,  # (b, h, j, d)
    *,
    scale: float = 8.0,
    attn_bias: Optional[jax.Array] = None,  # (h, i, j) or (b, h, i, j)
    key_mask: Optional[jax.Array] = None,  # (b, j) bool, True = attend
    causal: bool = False,
    use_alibi: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    allow_flash: bool = True,
) -> jax.Array:
    """Cosine-similarity attention core.

    q and k are expected already L2-normalized and per-dim scaled by the
    caller (the learned q_scale/k_scale); this function applies the fixed
    `scale`, biases, masks, softmax (fp32), and the PV matmul.

    On TPU this dispatches to the fused Pallas flash kernel
    (ops/pallas_attention.py) — one HBM pass, no materialized (i, j) matrix.
    Pass allow_flash=False when the result will be differentiated to second
    order (the kernel's custom VJP is first-order reverse-mode only).
    """
    b, h, i, d = q.shape
    j = k.shape[2]

    if allow_flash and _use_flash(q, attn_bias, dropout_rate, deterministic):
        from phenaki_tpu.ops.pallas_attention import NEG_INF as _NEG, flash_qk_attention

        bias = attn_bias
        if causal and use_alibi:
            ab = alibi_bias(h, i, j)
            bias = ab if bias is None else bias + ab
        kmask_add = None
        if key_mask is not None:
            kmask_add = jnp.where(key_mask, 0.0, _NEG).astype(jnp.float32)
        return flash_qk_attention(q, k, v, bias, kmask_add, float(scale), causal)

    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale

    if attn_bias is not None:
        if attn_bias.ndim == 3:
            attn_bias = attn_bias[None]
        sim = sim + attn_bias.astype(sim.dtype)

    if key_mask is not None:
        sim = jnp.where(key_mask[:, None, None, :], sim, NEG_INF)

    if causal:
        if use_alibi:
            sim = sim + alibi_bias(h, i, j)[None]
        # queries occupy the last i of the j key positions (matches reference
        # attention.py:173: triu(j - i + 1))
        q_pos = jnp.arange(i)[:, None] + (j - i)
        k_pos = jnp.arange(j)[None, :]
        causal_mask = k_pos <= q_pos
        sim = jnp.where(causal_mask[None, None], sim, NEG_INF)

    attn = jax.nn.softmax(sim, axis=-1)

    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = attn * keep / (1.0 - dropout_rate)

    attn = attn.astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


class Attention(nn.Module):
    """Self- or cross-attention block (reference attention.py:89-182).

    Pre-LN on x (and on context when `norm_context`), no-bias projections,
    L2-normalized q/k with learned per-dim scales and fixed `scale` (SwinV2),
    optional learned null key/value pairs (gives cross-attention something to
    attend to when text conditioning is dropped for CFG), optional causal
    masking with ALiBi.
    """

    dim: int
    dim_context: Optional[int] = None
    dim_head: int = 64
    heads: int = 8
    causal: bool = False
    num_null_kv: int = 0
    norm_context: bool = True
    dropout: float = 0.0
    scale: float = 8.0
    # reference quirk (attention.py:138-142): in self-attention the
    # reference takes K/V from the PRE-norm input (kv_input is bound before
    # x = self.norm(x)), so only queries see the LayerNorm. Our default
    # normalizes K/V too — better-conditioned training (measured: the
    # moving-shapes system check reaches 100% caption accuracy vs 53% with
    # the quirk). Set True when loading converted reference checkpoints,
    # whose trained weights expect the quirked statistics.
    reference_self_kv: bool = False
    # route through the fused Pallas kernel on TPU. Disable for modules that
    # need HIGHER-ORDER gradients (e.g. the discriminator under the R1
    # gradient penalty / adaptive-weight losses): the kernel's custom_vjp
    # supports first-order reverse-mode only.
    use_flash: bool = True
    # sequence parallelism (parallel/ring_attention.py): when a mesh and an
    # axis name are set, SELF-attention over sequences divisible by the axis
    # runs ring attention under shard_map — q/k/v sharded on the sequence
    # axis, K/V shards rotating over the ICI ring, so one chip never holds
    # the full sequence. Long-scene extension beyond the reference (which
    # only chains scenes, SURVEY.md §5.7). Does not compose with the GPipe
    # pipeline (both are shard_maps); cross-attention stays dense.
    seq_shard_mesh: Optional[Any] = None  # jax.sharding.Mesh
    seq_shard_axis: Optional[str] = None
    # manual tensor parallelism (shard_map mode): this module instance is the
    # LOCAL head shard of a Megatron split — `heads` is heads_global/tp, the
    # q/kv/null-kv params are the matching head slices (k|v column pairs kept
    # per-rank by parallel/tp_inference.pack_tp_params), to_out holds the row
    # slice, and the output is completed with one psum over this axis.
    tp_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (b, n, dim)
        mask: Optional[jax.Array] = None,  # (b, j) key padding mask
        context: Optional[jax.Array] = None,  # (b, m, dim_context)
        attn_bias: Optional[jax.Array] = None,  # (h, i, j) additive
        deterministic: bool = True,
    ) -> jax.Array:
        batch = x.shape[0]
        inner_dim = self.dim_head * self.heads
        dim_context = self.dim_context if self.dim_context is not None else self.dim

        if context is not None:
            if self.norm_context:
                context = LayerNorm(dim_context, dtype=self.dtype, name="context_norm")(
                    context
                )
            kv_input = context
        elif self.reference_self_kv:
            kv_input = x  # pre-norm input (see field docstring)
        else:
            kv_input = None

        x = LayerNorm(self.dim, dtype=self.dtype, name="norm")(x)
        if kv_input is None:
            kv_input = x

        w_q = _ProjKernel(inner_dim, self.dim, name="to_q")()
        w_kv = _ProjKernel(inner_dim * 2, kv_input.shape[-1], name="to_kv")()
        if kv_input is x:
            # self-attention: ONE fused projection matmul (dim -> 3*inner)
            qkv = x @ jnp.concatenate([w_q, w_kv], axis=1).astype(self.dtype)
            q, kv = qkv[..., :inner_dim], qkv[..., inner_dim:]
        else:
            q = x @ w_q.astype(self.dtype)
            kv = kv_input @ w_kv.astype(self.dtype)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = map(split_heads, (q, k, v))

        if self.num_null_kv > 0:
            null_kv = self.param(
                "null_kv",
                nn.initializers.normal(1.0),
                (self.heads, 2 * self.num_null_kv, self.dim_head),
                jnp.float32,
            )
            nk, nv = jnp.split(null_kv.astype(self.dtype), 2, axis=-2)
            nk = jnp.broadcast_to(nk[None], (batch, *nk.shape))
            nv = jnp.broadcast_to(nv[None], (batch, *nv.shape))
            k = jnp.concatenate([nk, k], axis=-2)
            v = jnp.concatenate([nv, v], axis=-2)

        q_scale = self.param("q_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)
        k_scale = self.param("k_scale", nn.initializers.ones, (self.dim_head,), jnp.float32)

        # memory-lean custom VJP: saves only the bf16 inputs (norms.py)
        q = l2norm_scaled(q, q_scale)
        k = l2norm_scaled(k, k_scale)

        if attn_bias is not None and self.num_null_kv > 0:
            pad = [(0, 0)] * (attn_bias.ndim - 1) + [(self.num_null_kv, 0)]
            attn_bias = jnp.pad(attn_bias, pad)

        if mask is not None and self.num_null_kv > 0:
            mask = jnp.pad(
                mask, [(0, 0), (self.num_null_kv, 0)], constant_values=True
            )

        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")

        # sequence-sharded (ring) self-attention when configured and the
        # shapes allow it; anything else falls through to the dense/flash core
        if (
            self.seq_shard_mesh is not None
            and self.seq_shard_axis is not None
            and context is None
            and self.num_null_kv == 0
            and dropout_rng is None
            and not self.is_initializing()
            and self.seq_shard_mesh.shape.get(self.seq_shard_axis, 1) > 1
            and q.shape[2] % self.seq_shard_mesh.shape[self.seq_shard_axis] == 0
        ):
            from phenaki_tpu.parallel.ring_attention import (
                sequence_sharded_attention,
            )

            n_q = q.shape[2]
            ring_bias = attn_bias
            if self.causal:
                ab = alibi_bias(self.heads, n_q, n_q)
                ring_bias = ab if ring_bias is None else ring_bias + ab
            out = sequence_sharded_attention(
                q,
                k,
                v,
                self.seq_shard_mesh,
                axis_name=self.seq_shard_axis,
                scale=self.scale,
                attn_bias=ring_bias,
                key_mask=mask,
                causal=self.causal,
            )
            out = out.transpose(0, 2, 1, 3).reshape(batch, -1, inner_dim)
            return nn.Dense(
                self.dim, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="to_out"
            )(out)

        out = qk_norm_attention(
            q,
            k,
            v,
            scale=self.scale,
            attn_bias=attn_bias,
            key_mask=mask,
            causal=self.causal,
            use_alibi=self.causal,  # reference ties ALiBi to causal self-attn
            dropout_rate=self.dropout,
            dropout_rng=dropout_rng,
            deterministic=deterministic,
            allow_flash=self.use_flash,
        )

        out = out.transpose(0, 2, 1, 3).reshape(batch, -1, inner_dim)
        out = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, dtype=self.dtype, name="to_out")(out)
        if self.tp_axis is not None:
            out = jax.lax.psum(out, self.tp_axis)
        return out
