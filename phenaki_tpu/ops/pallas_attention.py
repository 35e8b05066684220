"""Fused flash-attention Pallas TPU kernel for QK-norm cosine attention.

The reference (attention.py:89-182) materializes the (i, j) similarity matrix
in HBM per head (for MaskGit at 1152 tokens that is ~5 MB/head/batch, read and
written several times: sim, +bias, softmax, PV). This kernel streams K/V/bias
blocks through VMEM and keeps the softmax running statistics (m, l) and the
output accumulator on-chip — one HBM pass over q/k/v/bias, no materialized
attention matrix.

Supported surface (matches ops.attention.qk_norm_attention):
  * additive attention bias (heads, i, j) — the CPB / ALiBi tables
  * additive key mask (b, j) as 0 / -inf floats (padding + key-padding mask)
  * causal masking with queries occupying the last `i` of `j` positions
  * fp32 softmax statistics regardless of input dtype (bf16 in production)

Backward: `flash_qk_attention` carries a custom VJP whose backward recomputes
attention with plain XLA einsums (exact same math as the reference path).
Training still benefits from the fused forward; the backward stays
XLA-fused and numerically identical to the unfused implementation.

Blocks are (128, 128) over (i, j) with dim_head <= 128 kept resident. Inputs
are padded to block multiples here and the padding is masked/sliced away.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

_INTERPRET = False  # flipped by tests / CPU fallback


_BLOCK_Q_CANDIDATES = (512, 384, 256, 128)
_BLOCK_K_CANDIDATES = (512, 384, 256, 128)
# cap bq*bk so the f32 score block stays ~<1MB of VMEM (plus pipelining room)
_MAX_BLOCK_AREA = 512 * 512


def _block_sizes(i: int, j: int):
    """Largest divisor blocks under a VMEM budget. Kernel-invocation overhead
    (~10 us on this backend) dominates at small blocks — a (2, 8, 9, 9) grid
    of 128x128 tiles costs more in setup than in math — and the d=64
    contraction needs large bq/bk tiles to fill the MXU. bq may cover the
    whole query axis (multiple of 8 sublanes suffices); bk must stay a
    multiple of 128 lanes for the bias block."""
    i_pad = _round_up(i, 128)
    j_pad = _round_up(j, 128)
    bq = next((c for c in _BLOCK_Q_CANDIDATES if i_pad % c == 0), 128)
    bk = next(
        (
            c
            for c in _BLOCK_K_CANDIDATES
            if j_pad % c == 0 and bq * c <= _MAX_BLOCK_AREA
        ),
        128,
    )
    return min(bq, i_pad), min(bk, j_pad)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(
    q_ref,  # (1, 1, bq, d)
    k_ref,  # (1, 1, bk, d)
    v_ref,  # (1, 1, bk, d)
    bias_ref,  # (1, bq, bk) or None
    kmask_ref,  # (1, bk) additive f32 or None
    out_ref,  # (1, 1, bq, d)
    m_scr,  # (bq, 128) f32
    l_scr,  # (bq, 128) f32
    acc_scr,  # (bq, d) f32
    *,
    scale: float,
    causal: bool,
    q_offset: int,  # j - i (queries sit at the last i of j positions)
    num_k_blocks: int,
    block_q: int,
    block_k: int,
):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale

    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)

    if kmask_ref is not None:
        s = s + kmask_ref[0].astype(jnp.float32)  # (1, bk) broadcasts over rows

    if causal:
        qi = pl.program_id(2)
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + qi * block_q
            + q_offset
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        s = jnp.where(col <= row, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # (bq, bk) f32
    alpha = jnp.exp(m_prev - m_new)  # (bq, 1)

    l_new = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        l = l_scr[:, :1]
        out = acc_scr[:] / jnp.maximum(l, 1e-30)
        out_ref[0, 0] = out.astype(out_ref.dtype)


def _flash_forward(
    q: jax.Array,  # (b, h, i, d)
    k: jax.Array,  # (b, h, j, d)
    v: jax.Array,  # (b, h, j, d)
    bias: Optional[jax.Array],  # (h, i, j)
    kmask_add: Optional[jax.Array],  # (b, j) additive f32
    *,
    scale: float,
    causal: bool,
) -> jax.Array:
    b, h, i, d = q.shape
    j = k.shape[2]
    out_dtype = q.dtype

    block_q, block_k = _block_sizes(i, j)
    i_pad = _round_up(i, block_q)
    j_pad = _round_up(j, block_k)

    if i_pad != i:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, i_pad - i), (0, 0)))
    if j_pad != j:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, j_pad - j), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, j_pad - j), (0, 0)))
        # padded keys must never receive attention weight
        if kmask_add is None:
            kmask_add = jnp.zeros((b, j), jnp.float32)
        kmask_add = jnp.pad(
            kmask_add, ((0, 0), (0, j_pad - j)), constant_values=NEG_INF
        )
    if bias is not None and (i_pad != i or j_pad != j):
        bias = jnp.pad(bias, ((0, 0), (0, i_pad - i), (0, j_pad - j)))
    if bias is not None:
        # stream the bias in the compute dtype: it is the largest input
        # (h, i, j) and attention adds it pre-softmax where bf16 is plenty
        bias = bias.astype(out_dtype)

    num_q_blocks = i_pad // block_q
    num_k_blocks = j_pad // block_k
    grid = (b, h, num_q_blocks, num_k_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bb, hh, qi, ki: (bb, hh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_k, d),
            lambda bb, hh, qi, ki: (bb, hh, ki, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, 1, block_k, d),
            lambda bb, hh, qi, ki: (bb, hh, ki, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    operands = [q, k, v]
    if bias is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_k),
                lambda bb, hh, qi, ki: (hh, qi, ki),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(bias)
    if kmask_add is not None:
        # (b, 1, j): a (1, 1, block_k) block satisfies the TPU tile rule
        # (second-to-last block dim == full array dim)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bb, hh, qi, ki: (bb, 0, ki),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(kmask_add.astype(jnp.float32)[:, None, :])

    kernel = functools.partial(
        _flash_kernel_dispatch,
        has_bias=bias is not None,
        has_kmask=kmask_add is not None,
        scale=scale,
        causal=causal,
        q_offset=j - i,
        num_k_blocks=num_k_blocks,
        block_q=block_q,
        block_k=block_k,
    )

    flops = 4 * b * h * i_pad * j_pad * d
    bytes_accessed = (
        q.size * q.dtype.itemsize
        + 2 * k.size * k.dtype.itemsize
        + (bias.size * bias.dtype.itemsize if bias is not None else 0)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, i_pad, d), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d),
            lambda bb, hh, qi, ki: (bb, hh, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * h * i_pad * j_pad
        ),
        interpret=_INTERPRET,
    )(*operands)

    if i_pad != i:
        out = out[:, :, :i]
    return out


def _flash_kernel_dispatch(*refs, has_bias, has_kmask, **kw):
    """Unpack the optional bias/kmask refs by position."""
    idx = 3
    bias_ref = None
    kmask_ref = None
    args = list(refs)
    q_ref, k_ref, v_ref = args[:3]
    if has_bias:
        bias_ref = args[idx]
        idx += 1
    if has_kmask:
        kmask_ref = args[idx]
        idx += 1
    out_ref, m_scr, l_scr, acc_scr = args[idx : idx + 4]
    _flash_kernel(
        q_ref, k_ref, v_ref, bias_ref, kmask_ref, out_ref, m_scr, l_scr, acc_scr, **kw
    )


def _reference_attention(q, k, v, bias, kmask_add, *, scale, causal):
    """Plain-XLA math, identical to ops.attention.qk_norm_attention's core.
    Used for the custom-VJP backward (and as a correctness oracle in tests)."""
    sim = jnp.einsum(
        "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        sim = sim + bias[None].astype(sim.dtype)
    if kmask_add is not None:
        sim = sim + kmask_add[:, None, None, :].astype(sim.dtype)
    if causal:
        i, j = sim.shape[-2], sim.shape[-1]
        row = jnp.arange(i)[:, None] + (j - i)
        col = jnp.arange(j)[None, :]
        sim = jnp.where(col <= row, sim, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_qk_attention(q, k, v, bias, kmask_add, scale, causal):
    """Fused attention: softmax(q @ k^T * scale + bias + kmask) @ v.

    q: (b, h, i, d); k, v: (b, h, j, d); bias: (h, i, j) or None;
    kmask_add: (b, j) additive floats (0 or -inf) or None.
    """
    return _flash_forward(q, k, v, bias, kmask_add, scale=scale, causal=causal)


def _fwd(q, k, v, bias, kmask_add, scale, causal):
    out = _flash_forward(q, k, v, bias, kmask_add, scale=scale, causal=causal)
    return out, (q, k, v, bias, kmask_add)


def _bwd(scale, causal, residuals, g):
    q, k, v, bias, kmask_add = residuals
    # exact-math recompute backward: XLA fuses this well and it is bit-stable
    # against the unfused reference path
    def ref(q, k, v, bias):
        return _reference_attention(
            q, k, v, bias, kmask_add, scale=scale, causal=causal
        )

    _, vjp = jax.vjp(ref, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias, None


flash_qk_attention.defvjp(_fwd, _bwd)
