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

Backward: `flash_qk_attention` carries a custom VJP implemented as three
blockwise Pallas kernels (dQ; dK+dV; dBias) that recompute
`p = exp(s - lse)` from the forward's saved per-row log-sum-exp — the (i, j)
attention matrix never exists in HBM in either direction. The recompute is
the same math as the one-shot softmax but a different f32 rounding path
(tests compare against the XLA oracle at atol 1e-3). First-order
reverse-mode only: paths needing higher-order gradients (the GAN
discriminator under the R1 penalty) must use
qk_norm_attention(..., allow_flash=False).

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

LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453


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
    c2_ref,  # (1, 1) f32 in SMEM: softmax shift in log2 units (score bound)
    q_ref,  # (1, 1, bq, d)
    k_ref,  # (1, 1, bk, d)
    vaug_ref,  # (1, 1, bk, d_aug) — [v | 1 | 0...] (ones column at index d)
    bias_ref,  # (1, bq, bk) or None
    kmask_ref,  # (1, bk) additive f32 or None
    offs_ref,  # (1, 2) i32 SMEM [q_global_offset, k_global_offset] or None
    out_ref,  # (1, 1, bq, d_aug) f32 — [sum p*v | sum p | junk]
    acc_scr,  # (bq, d_aug) f32
    *,
    scale: float,
    causal: bool,
    q_offset: int,  # j - i (queries sit at the last i of j positions)
    num_k_blocks: int,
    block_q: int,
    block_k: int,
):
    """Bounded-shift flash forward. QK-norm cosine attention has BOUNDED
    scores (q, k are L2-normalized per dim before the learned scales), so
    instead of tracking a running row max the wrapper precomputes one global
    upper bound c2 >= max score (Cauchy-Schwarz: scale*max||q_i||*max||k_j||,
    a few-us reduction) and the kernel uses p = 2^(s*log2e - c2) directly.
    Per k block the VPU does ONLY elementwise work (bias/kmask adds, one fma,
    one exp2) — no max or sum lane-reductions, no accumulator rescale. The
    softmax denominator is the MXU's job: v is augmented with a ones column,
    so `p @ v_aug` yields [p@v | sum(p)] in one dot (free for d < 128: the PV
    matmul already pads its output lanes to 128). Normalization happens
    outside the kernel. Numerics: p <= 1 by construction; underflow needs a
    row max more than ~85 ln2 below the bound, unreachable for cosine scores
    (the gap is at most 2*scale*||q_scale||*||k_scale|| plus the bias range)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    vaug = vaug_ref[0, 0]

    # NOTE: `scale` is pre-folded into q by _flash_forward (one multiply over
    # (i, d) instead of one per (i, j) score element per k block)
    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)

    if kmask_ref is not None:
        s = s + kmask_ref[0].astype(jnp.float32)  # (1, bk) broadcasts over rows

    # p = exp(s - c2*ln2) = 2^(s*log2e - c2): one fma + one exp2 on the VPU
    p = jnp.exp2(s * LOG2E - c2_ref[0, 0])

    if causal:
        qi = pl.program_id(2)
        # ring chunks supply GLOBAL (q, k) position offsets at runtime
        # (SMEM); the single-chunk path keeps the static j - i convention
        row_off = qi * block_q + (
            offs_ref[0, 0] if offs_ref is not None else q_offset
        )
        col_off = ki * block_k + (
            offs_ref[0, 1] if offs_ref is not None else 0
        )
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + row_off
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + col_off
        p = jnp.where(col <= row, p, 0.0)

    acc_scr[:] += jax.lax.dot_general(
        p.astype(vaug.dtype),
        vaug,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        out_ref[0, 0] = acc_scr[:]


def _pad_attention_inputs(q, k, v, bias, kmask_add):
    """Pad all operands to block multiples; padded keys get -inf mask."""
    b, h, i, d = q.shape
    j = k.shape[2]
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
        bias = bias.astype(q.dtype)
    if kmask_add is not None:
        kmask_add = kmask_add.astype(jnp.float32)[:, None, :]  # (b, 1, j_pad)
    return q, k, v, bias, kmask_add, block_q, block_k, i_pad, j_pad


# block spec builders shared by forward and backward (grid args: the last two
# grid axes select the q block (qi) and k block (ki) in some order)
def _spec_q(block_q, d, qi_axis):
    return pl.BlockSpec(
        (1, 1, block_q, d),
        lambda bb, hh, x2, x3: (bb, hh, (x2, x3)[qi_axis], 0),
        memory_space=pltpu.VMEM,
    )


def _spec_k(block_k, d, ki_axis):
    return pl.BlockSpec(
        (1, 1, block_k, d),
        lambda bb, hh, x2, x3: (bb, hh, (x2, x3)[ki_axis], 0),
        memory_space=pltpu.VMEM,
    )


def _spec_bias(block_q, block_k, qi_axis, ki_axis):
    return pl.BlockSpec(
        (1, block_q, block_k),
        lambda bb, hh, x2, x3: (hh, (x2, x3)[qi_axis], (x2, x3)[ki_axis]),
        memory_space=pltpu.VMEM,
    )


def _spec_kmask(block_k, ki_axis):
    # (b, 1, j): a (1, 1, block_k) block satisfies the TPU tile rule
    # (second-to-last block dim == full array dim)
    return pl.BlockSpec(
        (1, 1, block_k),
        lambda bb, hh, x2, x3: (bb, 0, (x2, x3)[ki_axis]),
        memory_space=pltpu.VMEM,
    )


def _spec_rowvec(block_q, qi_axis):
    # per-query-row scalars (lse, delta) as (b, h, i_pad, 1)
    return pl.BlockSpec(
        (1, 1, block_q, 1),
        lambda bb, hh, x2, x3: (bb, hh, (x2, x3)[qi_axis], 0),
        memory_space=pltpu.VMEM,
    )


def _flash_forward(
    q: jax.Array,  # (b, h, i, d)
    k: jax.Array,  # (b, h, j, d)
    v: jax.Array,  # (b, h, j, d)
    bias: Optional[jax.Array],  # (h, i, j)
    kmask_add: Optional[jax.Array],  # (b, j) additive f32
    *,
    scale: float,
    causal: bool,
    return_lse: bool = False,
    c2_external: Optional[jax.Array] = None,  # (1, 1) f32 log2-units bound
    offsets: Optional[jax.Array] = None,  # (2,) i32 global (q, k) offsets
    return_raw: bool = False,  # raw f32 [sum p*v | sum p | 0...] accumulator
):
    b, h, i, d = q.shape
    j = k.shape[2]
    out_dtype = q.dtype

    q, k, v, bias, kmask_add, block_q, block_k, i_pad, j_pad = (
        _pad_attention_inputs(q, k, v, bias, kmask_add)
    )
    # fold the softmax scale into q once ((i, d) elements) instead of scaling
    # every (i, j) score element inside the kernel (scale=8 is a power of two,
    # so this is exact even in bf16); backward kernels apply scale themselves
    q = q * jnp.asarray(scale, q.dtype)

    if c2_external is not None:
        # ring chunks share ONE global bound so per-chunk raw accumulators
        # add directly (parallel/ring_attention.py)
        c2 = c2_external.reshape(1, 1).astype(jnp.float32)
    else:
        # global score upper bound (Cauchy-Schwarz over the padded q/k, which
        # only adds zero rows): the kernel's softmax shift. Tiny reduction,
        # fused by XLA.
        qn = jnp.sqrt(jnp.max(jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)))
        kn = jnp.sqrt(jnp.max(jnp.sum(k.astype(jnp.float32) ** 2, axis=-1)))
        c2 = (qn * kn * LOG2E).reshape(1, 1)

    # v augmented with a ones column so sum(p) rides the PV matmul (MXU); the
    # remaining columns up to the 128-lane boundary are zero
    d_aug = _round_up(d + 1, 128)
    vaug = jnp.concatenate(
        [
            v,
            jnp.ones((b, h, j_pad, 1), v.dtype),
            jnp.zeros((b, h, j_pad, d_aug - d - 1), v.dtype),
        ],
        axis=-1,
    )

    num_q_blocks = i_pad // block_q
    num_k_blocks = j_pad // block_k
    grid = (b, h, num_q_blocks, num_k_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1), lambda bb, hh, x2, x3: (0, 0), memory_space=pltpu.SMEM
        ),
        _spec_q(block_q, d, 0),
        _spec_k(block_k, d, 1),
        _spec_k(block_k, d_aug, 1),
    ]
    operands = [c2, q, k, vaug]
    if bias is not None:
        in_specs.append(_spec_bias(block_q, block_k, 0, 1))
        operands.append(bias)
    if kmask_add is not None:
        in_specs.append(_spec_kmask(block_k, 1))
        operands.append(kmask_add)
    if offsets is not None:
        in_specs.append(
            pl.BlockSpec(
                (1, 2), lambda bb, hh, x2, x3: (0, 0), memory_space=pltpu.SMEM
            )
        )
        operands.append(offsets.reshape(1, 2).astype(jnp.int32))

    kernel = functools.partial(
        _flash_kernel_dispatch,
        has_bias=bias is not None,
        has_kmask=kmask_add is not None,
        has_offs=offsets is not None,
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
    raw = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, i_pad, d_aug), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=_spec_q(block_q, d_aug, 0),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_aug), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=b * h * i_pad * j_pad
        ),
        interpret=_INTERPRET,
    )(*operands)

    if return_raw:
        # unnormalized chunk result for ring accumulation (rows sliced back
        # to the true i; padded k rows contributed 0 via the -inf kmask)
        return raw[:, :, :i] if i_pad != i else raw

    # normalize outside the kernel: out = (sum p*v) / (sum p); lse recovers
    # the natural-log-sum-exp the backward kernels expect
    l = jnp.maximum(raw[..., d : d + 1], 1e-37)
    out = (raw[..., :d] / l).astype(out_dtype)

    if i_pad != i:
        out = out[:, :, :i]
    if return_lse:
        lse = jnp.log(l) + c2[0, 0] * LN2
        return out, lse  # lse stays PADDED (backward kernels run padded)
    return out


def _flash_kernel_dispatch(*refs, has_bias, has_kmask, has_offs=False, **kw):
    """Unpack the optional bias/kmask/offsets refs by position."""
    idx = 4
    bias_ref = None
    kmask_ref = None
    offs_ref = None
    args = list(refs)
    c2_ref, q_ref, k_ref, v_ref = args[:4]
    if has_bias:
        bias_ref = args[idx]
        idx += 1
    if has_kmask:
        kmask_ref = args[idx]
        idx += 1
    if has_offs:
        offs_ref = args[idx]
        idx += 1
    out_ref, acc_scr = args[idx : idx + 2]
    _flash_kernel(
        c2_ref, q_ref, k_ref, v_ref, bias_ref, kmask_ref, offs_ref, out_ref,
        acc_scr, **kw
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


# --------------------------------------------------------------------------
# backward kernels: recompute p = exp(s - lse) blockwise (flash-style), then
#   delta = rowsum(dO * O)
#   dV    = p^T @ dO
#   dS    = p * (dO @ V^T - delta)
#   dQ    = scale * dS @ K      dK = scale * dS^T @ Q      dBias = sum_b dS
# --------------------------------------------------------------------------


def _recompute_p(
    q_ref, k_ref, bias_ref, kmask_ref, lse_ref, *, scale, causal, q_offset,
    qi, ki, block_q, block_k, offs_ref=None
):
    """(bq, bk) softmax probabilities for one (q block, k block) pair."""
    s = jax.lax.dot_general(
        q_ref[0, 0],
        k_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)
    if kmask_ref is not None:
        s = s + kmask_ref[0].astype(jnp.float32)
    if causal:
        row_off = qi * block_q + (
            offs_ref[0, 0] if offs_ref is not None else q_offset
        )
        col_off = ki * block_k + (
            offs_ref[0, 1] if offs_ref is not None else 0
        )
        row = (
            jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + row_off
        )
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + col_off
        s = jnp.where(col <= row, s, NEG_INF)
    # exp(s - lse) as one fma + exp2 (cheaper than exp on the VPU)
    return jnp.exp2(s * LOG2E - lse_ref[0, 0] * LOG2E)  # (bq, bk); lse (bq, 1)


def _bwd_dq_kernel(*refs, has_bias, has_kmask, scale, causal, q_offset,
                   num_k_blocks, block_q, block_k, has_offs=False):
    args = list(refs)
    q_ref, k_ref, v_ref = args[:3]
    idx = 3
    bias_ref = args[idx] if has_bias else None
    idx += 1 if has_bias else 0
    kmask_ref = args[idx] if has_kmask else None
    idx += 1 if has_kmask else 0
    offs_ref = args[idx] if has_offs else None
    idx += 1 if has_offs else 0
    do_ref, lse_ref, delta_ref, dq_ref, dq_acc = args[idx:]

    qi = pl.program_id(2)
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    p = _recompute_p(
        q_ref, k_ref, bias_ref, kmask_ref, lse_ref, scale=scale, causal=causal,
        q_offset=q_offset, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
        offs_ref=offs_ref,
    )
    dp = jax.lax.dot_general(  # dO @ V^T  (bq, bk)
        do_ref[0, 0], v_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0])  # delta block (bq, 1) broadcasts
    dq_acc[:] += jax.lax.dot_general(  # dS @ K  (bq, d)
        ds.astype(k_ref.dtype), k_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == num_k_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(*refs, has_bias, has_kmask, scale, causal, q_offset,
                    num_q_blocks, block_q, block_k, has_offs=False):
    args = list(refs)
    q_ref, k_ref, v_ref = args[:3]
    idx = 3
    bias_ref = args[idx] if has_bias else None
    idx += 1 if has_bias else 0
    kmask_ref = args[idx] if has_kmask else None
    idx += 1 if has_kmask else 0
    offs_ref = args[idx] if has_offs else None
    idx += 1 if has_offs else 0
    do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc = args[idx:]

    ki = pl.program_id(2)
    qi = pl.program_id(3)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    p = _recompute_p(
        q_ref, k_ref, bias_ref, kmask_ref, lse_ref, scale=scale, causal=causal,
        q_offset=q_offset, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
        offs_ref=offs_ref,
    )
    pt = p.astype(do_ref.dtype)
    dv_acc[:] += jax.lax.dot_general(  # p^T @ dO  (bk, d)
        pt, do_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do_ref[0, 0], v_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0])
    dk_acc[:] += jax.lax.dot_general(  # dS^T @ Q  (bk, d)
        ds.astype(q_ref.dtype), q_ref[0, 0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == num_q_blocks - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dbias_kernel(*refs, has_kmask, scale, causal, q_offset, num_b,
                      block_q, block_k, has_offs=False):
    args = list(refs)
    q_ref, k_ref, v_ref, bias_ref = args[:4]
    idx = 4
    kmask_ref = args[idx] if has_kmask else None
    idx += 1 if has_kmask else 0
    offs_ref = args[idx] if has_offs else None
    idx += 1 if has_offs else 0
    do_ref, lse_ref, delta_ref, dbias_ref = args[idx:]

    qi = pl.program_id(1)
    ki = pl.program_id(2)
    bb = pl.program_id(3)

    @pl.when(bb == 0)
    def _init():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    p = _recompute_p(
        q_ref, k_ref, bias_ref, kmask_ref, lse_ref, scale=scale, causal=causal,
        q_offset=q_offset, qi=qi, ki=ki, block_q=block_q, block_k=block_k,
        offs_ref=offs_ref,
    )
    dp = jax.lax.dot_general(
        do_ref[0, 0], v_ref[0, 0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0, 0])
    dbias_ref[0] += ds.astype(dbias_ref.dtype)


def _flash_backward(q, k, v, bias, kmask_add, out, lse, g, *, scale, causal,
                    offsets=None, delta=None):
    """dq, dk, dv, dbias via three blockwise kernels (p recomputed, never
    materialized in HBM).

    Ring-chunk mode (parallel/ring_attention.py): `delta` supplies the
    per-row correction directly (for raw-accumulator cotangents it is -cl,
    see flash_attend_chunk) with `lse`/`delta` UNPADDED (b, h, i, 1) f32 and
    `out=None`; `offsets` are the traced global (q, k) position offsets for
    the causal mask."""
    b, h, i, d = q.shape
    j = k.shape[2]
    in_dtype = q.dtype
    has_bias = bias is not None

    qp, kp, vp, biasp, kmaskp, block_q, block_k, i_pad, j_pad = (
        _pad_attention_inputs(q, k, v, bias, kmask_add)
    )
    do = g
    if i_pad != i:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, i_pad - i), (0, 0)))
    do = do.astype(in_dtype)

    if delta is None:
        # delta = rowsum(dO * O) per query row (padded rows: dO = 0 -> 0);
        # `lse` arrives PADDED from the forward in this mode
        delta = jnp.sum(
            do[:, :, :i].astype(jnp.float32) * out.astype(jnp.float32),
            axis=-1,
            keepdims=True,
        )
        if i_pad != i:
            delta = jnp.pad(delta, ((0, 0), (0, 0), (0, i_pad - i), (0, 0)))
    elif i_pad != i:
        # chunk mode: stats arrive unpadded
        delta = jnp.pad(delta, ((0, 0), (0, 0), (0, i_pad - i), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, 0), (0, i_pad - i), (0, 0)))

    offs_op = None
    if offsets is not None:
        offs_op = offsets.reshape(1, 2).astype(jnp.int32)

    num_q = i_pad // block_q
    num_k = j_pad // block_k
    common = dict(scale=scale, causal=causal, q_offset=j - i,
                  block_q=block_q, block_k=block_k,
                  has_offs=offs_op is not None)

    def opt_specs(qi_axis, ki_axis):
        specs, ops = [], []
        if biasp is not None:
            specs.append(_spec_bias(block_q, block_k, qi_axis, ki_axis))
            ops.append(biasp)
        if kmaskp is not None:
            specs.append(_spec_kmask(block_k, ki_axis))
            ops.append(kmaskp)
        if offs_op is not None:
            specs.append(
                pl.BlockSpec(
                    (1, 2), lambda *_: (0, 0), memory_space=pltpu.SMEM
                )
            )
            ops.append(offs_op)
        return specs, ops

    # ---- dQ: grid (b, h, qi, ki), k sequential ---- #
    o_specs, o_ops = opt_specs(0, 1)
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, has_bias=biasp is not None,
            has_kmask=kmaskp is not None, num_k_blocks=num_k, **common,
        ),
        grid=(b, h, num_q, num_k),
        in_specs=[_spec_q(block_q, d, 0), _spec_k(block_k, d, 1),
                  _spec_k(block_k, d, 1), *o_specs,
                  _spec_q(block_q, d, 0), _spec_rowvec(block_q, 0),
                  _spec_rowvec(block_q, 0)],
        out_specs=_spec_q(block_q, d, 0),
        out_shape=jax.ShapeDtypeStruct((b, h, i_pad, d), in_dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp, *o_ops, do, lse, delta)

    # ---- dK/dV: grid (b, h, ki, qi), q sequential ---- #
    o_specs, o_ops = opt_specs(1, 0)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, has_bias=biasp is not None,
            has_kmask=kmaskp is not None, num_q_blocks=num_q, **common,
        ),
        grid=(b, h, num_k, num_q),
        in_specs=[_spec_q(block_q, d, 1), _spec_k(block_k, d, 0),
                  _spec_k(block_k, d, 0), *o_specs,
                  _spec_q(block_q, d, 1), _spec_rowvec(block_q, 1),
                  _spec_rowvec(block_q, 1)],
        out_specs=(_spec_k(block_k, d, 0), _spec_k(block_k, d, 0)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, j_pad, d), in_dtype),
            jax.ShapeDtypeStruct((b, h, j_pad, d), in_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_INTERPRET,
    )(qp, kp, vp, *o_ops, do, lse, delta)

    dbias = None
    if has_bias:
        # ---- dBias: grid (h, qi, ki, b), batch sequential accumulate ---- #
        def bspec(rank4_axis_map):
            return rank4_axis_map

        in_specs = [
            pl.BlockSpec((1, 1, block_q, d),
                         lambda hh, qi, ki, bb: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda hh, qi, ki, bb: (bb, hh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda hh, qi, ki, bb: (bb, hh, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, block_k),
                         lambda hh, qi, ki, bb: (hh, qi, ki),
                         memory_space=pltpu.VMEM),
        ]
        ops = [qp, kp, vp, biasp]
        if kmaskp is not None:
            in_specs.append(
                pl.BlockSpec((1, 1, block_k),
                             lambda hh, qi, ki, bb: (bb, 0, ki),
                             memory_space=pltpu.VMEM)
            )
            ops.append(kmaskp)
        if offs_op is not None:
            in_specs.append(
                pl.BlockSpec((1, 2), lambda *_: (0, 0),
                             memory_space=pltpu.SMEM)
            )
            ops.append(offs_op)
        in_specs += [
            pl.BlockSpec((1, 1, block_q, d),
                         lambda hh, qi, ki, bb: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda hh, qi, ki, bb: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda hh, qi, ki, bb: (bb, hh, qi, 0),
                         memory_space=pltpu.VMEM),
        ]
        dbias = pl.pallas_call(
            functools.partial(
                _bwd_dbias_kernel, has_kmask=kmaskp is not None, num_b=b,
                **common,
            ),
            grid=(h, num_q, num_k, b),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, block_q, block_k),
                lambda hh, qi, ki, bb: (hh, qi, ki),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((h, i_pad, j_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=_INTERPRET,
        )(*ops, do, lse, delta)
        dbias = dbias[:, :i, :j].astype(bias.dtype)

    dq = dq[:, :, :i]
    dk = dk[:, :, :j]
    dv = dv[:, :, :j]
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_qk_attention(q, k, v, bias, kmask_add, scale, causal):
    """Fused attention: softmax(q @ k^T * scale + bias + kmask) @ v.

    q: (b, h, i, d); k, v: (b, h, j, d); bias: (h, i, j) or None;
    kmask_add: (b, j) additive floats (0 or -inf) or None.

    First-order reverse-mode differentiable (flash-style backward kernels)
    in q, k, v and bias. `kmask_add` is treated as NON-differentiable: the
    custom VJP returns a zero cotangent for it (the true gradient would be
    sum over (h, i) of dS). Every caller in this package derives the mask
    from boolean padding data, where a zero gradient is correct — do NOT
    route a learned float mask through this argument.
    """
    return _flash_forward(q, k, v, bias, kmask_add, scale=scale, causal=causal)


def _fwd(q, k, v, bias, kmask_add, scale, causal):
    out, lse = _flash_forward(
        q, k, v, bias, kmask_add, scale=scale, causal=causal, return_lse=True
    )
    return out, (q, k, v, bias, kmask_add, out, lse)


def _bwd(scale, causal, residuals, g):
    q, k, v, bias, kmask_add, out, lse = residuals
    dq, dk, dv, dbias = _flash_backward(
        q, k, v, bias, kmask_add, out, lse, g, scale=scale, causal=causal
    )
    return dq, dk, dv, dbias, None


flash_qk_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# ring-attention chunk: UNNORMALIZED flash attend against one K/V shard.
# Because cosine attention's softmax shift c2 is a GLOBAL bound (pmax of the
# per-shard Cauchy-Schwarz bounds), per-chunk raw accumulators
# [sum p*v | sum p] simply ADD across ring rotations — no running-max
# bookkeeping crosses chips. parallel/ring_attention.py normalizes the sum.
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def flash_attend_chunk(q, k, v, bias, kmask_add, c2, offsets, scale, causal):
    """Raw (b, h, i, d_aug) f32 accumulator [sum p*v | sum p | 0...] for one
    K/V chunk, p = 2^(s*log2e - c2) with the caller-supplied global bound.

    `offsets` (2,) i32 gives the chunk's global (q, k) positions for the
    causal mask (None when not causal). Differentiable in q/k/v/bias; the
    VJP rides the same backward kernels as flash_qk_attention with
    do := d(acc), delta := -d(l), lse := c2*ln2 — `ds = p * (dO V^T - delta)`
    reduces to exactly the unnormalized-accumulator gradient. c2 must be
    stop-gradded by the caller (the normalized output is c2-invariant)."""
    return _flash_forward(
        q, k, v, bias, kmask_add, scale=scale, causal=causal,
        c2_external=c2, offsets=offsets, return_raw=True,
    )


def _chunk_fwd(q, k, v, bias, kmask_add, c2, offsets, scale, causal):
    raw = flash_attend_chunk(
        q, k, v, bias, kmask_add, c2, offsets, scale, causal
    )
    return raw, (q, k, v, bias, kmask_add, c2, offsets)


def _chunk_bwd(scale, causal, residuals, g):
    q, k, v, bias, kmask_add, c2, offsets = residuals
    b, h, i, d = q.shape
    ca = g[..., :d].astype(q.dtype)  # cotangent on sum p*v
    cl = g[..., d : d + 1].astype(jnp.float32)  # cotangent on sum p
    lse_rows = jnp.broadcast_to(
        c2.reshape(()).astype(jnp.float32) * LN2, (b, h, i, 1)
    )
    dq, dk, dv, dbias = _flash_backward(
        q, k, v, bias, kmask_add, None, lse_rows, ca,
        scale=scale, causal=causal, offsets=offsets, delta=-cl,
    )
    return dq, dk, dv, dbias, None, None, None


flash_attend_chunk.defvjp(_chunk_fwd, _chunk_bwd)


def _reference_backward(q, k, v, bias, kmask_add, g, *, scale, causal):
    """XLA-math backward oracle for tests."""

    def ref(q, k, v, bias):
        return _reference_attention(
            q, k, v, bias, kmask_add, scale=scale, causal=causal
        )

    _, vjp = jax.vjp(ref, q, k, v, bias)
    return vjp(g)
