"""Fused gumbel-argmax sampling + confidence score Pallas TPU kernel.

The MaskGit decode step (reference phenaki_pytorch.py:503-550) needs, per
token: (a) a temperature-annealed gumbel-max sample over the vocab and (b) a
re-masking score 1 - p(chosen) from the un-tempered softmax. Composed from
XLA ops that is three passes over the (n, 65536) logits (threefry noise,
argmax, softmax+gather), each a full HBM round trip. This kernel does all of
it in ONE pass per logits block using the TPU hardware PRNG
(pltpu.prng_random_bits): noise, tempered argmax, and the softmax statistics
(max + sum-exp) are computed while the block is resident in VMEM.

Sampling math matches ops/sampling.py::gumbel_sample exactly except for the
noise source (hardware PRNG vs threefry) — same distribution, different
stream, so results are deterministic per seed but not bit-equal to the XLA
path. For CPU/interpret testing (the TPU PRNG primitives have no CPU
lowering), uniform noise can be injected explicitly via `noise=`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests on CPU

_ROW_BLOCK = 8


def _kernel(seed_ref, temp_ref, logits_ref, *rest, has_noise: bool, has_cfg: bool):
    rest = list(rest)
    null_ref = rest.pop(0) if has_cfg else None
    scale_ref = rest.pop(0) if has_cfg else None
    noise_ref = rest.pop(0) if has_noise else None
    ids_ref, score_ref = rest

    i = pl.program_id(0)
    logits = logits_ref[...].astype(jnp.float32)  # (rows, V)
    if has_cfg:
        # classifier-free guidance combine fused in: the (rows, V) cond and
        # null logits are read once and never materialized combined in HBM
        # (reference phenaki_pytorch.py:149-161 runs it as a separate pass)
        null = null_ref[...].astype(jnp.float32)
        logits = null + (logits - null) * scale_ref[0]
    rows, v = logits.shape

    if noise_ref is not None:
        u = noise_ref[...].astype(jnp.float32)
    else:
        pltpu.prng_seed(seed_ref[0] + i)
        # uniform (0,1) from the top 24 bits of hardware random words
        # (bitcast first: the raw bits lower as SIGNED int32, and an
        # arithmetic shift would produce negative "uniforms" -> NaN gumbel)
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, v)), jnp.uint32)
        # logical shift clears the top byte, so the value fits int31 and the
        # bitcast->int32 is value-preserving (Mosaic lacks a uint32->f32 cast)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24)
        )

    eps = 1e-10
    gumbel = -jnp.log(-jnp.log(u + eps) + eps)

    inv_temp = 1.0 / jnp.maximum(temp_ref[0], 1e-10)
    y = logits * inv_temp + gumbel
    ids = jnp.argmax(y, axis=-1)  # (rows,)
    ids_ref[...] = ids.reshape(rows, 1).astype(jnp.int32)

    # score = 1 - softmax(logits)[chosen], on the UN-tempered logits
    # (reference :547-549)
    m = jnp.max(logits, axis=-1, keepdims=True)
    sumexp = jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, v), 1)
    chosen_logit = jnp.max(
        jnp.where(col == ids.reshape(rows, 1), logits, -jnp.inf),
        axis=-1,
        keepdims=True,
    )
    p_chosen = jnp.exp(chosen_logit - m) / sumexp
    score_ref[...] = (1.0 - p_chosen).astype(jnp.float32)


def gumbel_sample_with_score(
    logits: jax.Array,  # (b, n, V), or stacked CFG (2b, n, V) with cond_scale
    seed: jax.Array,  # scalar int32 (traced ok)
    temperature: jax.Array,  # scalar f32 (traced ok)
    noise: jax.Array | None = None,  # (b, n, V) uniform(0,1); testing hook
    cond_scale: jax.Array | float | None = None,  # CFG scale for stacked input
):
    """One fused pass: (sampled ids (b, n) int32, scores (b, n) f32).

    With `cond_scale`, `logits` is the STACKED CFG forward output
    (first b rows = conditioned, last b rows = null) and the combine
    `null + (cond - null) * scale` happens inside the kernel — the combined
    logits are never written to HBM."""
    has_cfg = cond_scale is not None
    bb, n, v = logits.shape
    b = bb // 2 if has_cfg else bb
    rows = b * n
    flat = logits.reshape(bb * n, v)

    pad = (-rows) % _ROW_BLOCK
    if pad and has_cfg:
        # padding would shift the null-half offset; fall back to an XLA combine
        cond, null = jnp.split(logits, 2, axis=0)
        combined = null + (cond - null) * jnp.asarray(cond_scale, logits.dtype)
        return gumbel_sample_with_score(combined, seed, temperature, noise)
    if pad:
        flat = jnp.pad(flat, ((0, pad), (0, 0)))
    total = rows + pad
    null_block_offset = rows // _ROW_BLOCK if has_cfg else 0

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((_ROW_BLOCK, v), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(temperature, jnp.float32).reshape(1),
        flat,
    ]
    if has_cfg:
        # the SAME array enters twice: cond blocks at i, null blocks at
        # i + rows/_ROW_BLOCK — no split, no copy
        in_specs.append(
            pl.BlockSpec(
                (_ROW_BLOCK, v),
                lambda i: (i + null_block_offset, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(flat)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(cond_scale, jnp.float32).reshape(1))
    if noise is not None:
        flat_noise = noise.reshape(rows, v)
        if pad:
            flat_noise = jnp.pad(
                flat_noise, ((0, pad), (0, 0)), constant_values=0.5
            )
        in_specs.append(
            pl.BlockSpec((_ROW_BLOCK, v), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(flat_noise.astype(jnp.float32))

    grid = (total // _ROW_BLOCK,)
    ids, score = pl.pallas_call(
        functools.partial(_kernel, has_noise=noise is not None, has_cfg=has_cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((_ROW_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROW_BLOCK, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total, 1), jnp.int32),
            jax.ShapeDtypeStruct((total, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(*operands)
    ids = ids[:rows, 0].reshape(b, n)
    score = score[:rows, 0].reshape(b, n)
    return ids, score


def use_fused_sampling() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# Fused logits-projection + gumbel sampling
# ---------------------------------------------------------------------------
#
# The decode step's dominant HBM traffic is the (b, n, 65536) logits produced
# by MaskGit's output projection (reference phenaki_pytorch.py:147,495-507):
# at b=1, n=1152 that is ~300 MB written by the Dense and re-read by the
# sampling kernel, every one of the 18 steps. This kernel fuses the projection
# itself: it streams vocab blocks of the output-embedding matrix W through
# VMEM, computes `h @ W_blk + bias_blk` on the MXU, and folds each block into
# running statistics (tempered-gumbel argmax, chosen logit, online-softmax
# max/sum-exp) held in VMEM scratch — the full logits never exist in HBM.
#
# CFG note: the classifier-free-guidance combine `null + (cond - null)*s` is
# LINEAR in the logits, and the projection is affine, so the combine is done
# upstream in embedding space (MaskGit.embeds_with_cond_scale) — mathematically
# identical, and it halves the projection FLOPs vs combining (2b, n, V) logits.

_PROJ_MAX_ROWS = 1024
_PROJ_VMEM_BUDGET = 12 * 1024 * 1024


# one W-block stream from HBM ~= this many rows of compute (see
# pallas_ce._W_STREAM_ROW_COST); weighs extra passes over W against padding
_W_STREAM_ROW_COST = 256


def _row_block(rows: int) -> int:
    """Block <= _PROJ_MAX_ROWS minimizing padded compute + W-stream passes.

    Minimizing padded rows alone picks tiny blocks for awkward row counts
    (rows=1025 -> r=8), which re-streams the whole (d, V) weight matrix once
    per block — an HBM cliff (ADVICE r2). Each extra block is costed at
    _W_STREAM_ROW_COST row-equivalents."""
    best = (None, None)
    for r in (1024, 896, 768, 640, 576, 512, 448, 384, 320, 256, 192, 128, 64, 32, 16, 8):
        num_blocks = -(-rows // r)
        score = num_blocks * r + _W_STREAM_ROW_COST * num_blocks
        if best[0] is None or score < best[0]:
            best = (score, r)
    return best[1]


def _proj_kernel(
    seed_ref, temp_ref, h_ref, w_ref, bias_ref, *rest, has_noise: bool
):
    rest = list(rest)
    noise_ref = rest.pop(0) if has_noise else None
    ids_ref, score_ref, ybest, chosen, m_run, se_run, bestid = rest

    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        ybest[...] = jnp.full_like(ybest[...], -jnp.inf)
        chosen[...] = jnp.zeros_like(chosen[...])
        m_run[...] = jnp.full_like(m_run[...], -jnp.inf)
        se_run[...] = jnp.zeros_like(se_run[...])
        bestid[...] = jnp.zeros_like(bestid[...])

    logits = jnp.dot(
        h_ref[...], w_ref[...], preferred_element_type=jnp.float32
    ) + bias_ref[...].astype(jnp.float32)
    rows, vb = logits.shape

    if noise_ref is not None:
        u = noise_ref[...].astype(jnp.float32)
    else:
        pltpu.prng_seed(seed_ref[0] + i * nj + j)
        bits = pltpu.bitcast(pltpu.prng_random_bits((rows, vb)), jnp.uint32)
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24)
        )

    eps = 1e-10
    gumbel = -jnp.log(-jnp.log(u + eps) + eps)
    inv_temp = 1.0 / jnp.maximum(temp_ref[0], 1e-10)
    y = logits * inv_temp + gumbel

    blk_best = jnp.max(y, axis=-1, keepdims=True)
    blk_arg = jnp.argmax(y, axis=-1).reshape(rows, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, vb), 1)
    blk_chosen = jnp.max(
        jnp.where(col == blk_arg, logits, -jnp.inf), axis=-1, keepdims=True
    )

    better = blk_best > ybest[...]
    ybest[...] = jnp.where(better, blk_best, ybest[...])
    bestid[...] = jnp.where(better, blk_arg + j * vb, bestid[...]).astype(jnp.int32)
    chosen[...] = jnp.where(better, blk_chosen, chosen[...])

    m_blk = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_run[...], m_blk)
    se_run[...] = se_run[...] * jnp.exp(m_run[...] - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    m_run[...] = m_new

    @pl.when(j == nj - 1)
    def _():
        ids_ref[...] = bestid[...]
        p_chosen = jnp.exp(chosen[...] - m_run[...]) / se_run[...]
        score_ref[...] = (1.0 - p_chosen).astype(jnp.float32)


def can_fuse_projection(d: int, v: int) -> bool:
    """Shape gate: clean lane tiling for h/W blocks and a divisible vocab."""
    return d % 128 == 0 and (v % 1024 == 0 or v % 512 == 0) and v >= 512


def project_gumbel_sample_with_score(
    h: jax.Array,  # (b, n, d) CFG-combined embeddings (post final norm)
    w: jax.Array,  # (d, V) output-projection kernel
    bias: jax.Array | None,  # (V,) or None
    seed: jax.Array,  # scalar int32 (traced ok)
    temperature: jax.Array,  # scalar f32 (traced ok)
    noise: jax.Array | None = None,  # (b, n, V) uniform(0,1); testing hook
):
    """Fused `softmax-sample(h @ w + bias)`: (ids (b, n) int32, scores (b, n) f32).

    Semantics identical to gumbel_sample_with_score(h @ w + bias, ...) — same
    gumbel-max sample and `1 - p(chosen)` score — but the (b·n, V) logits are
    never materialized in HBM: vocab blocks of `w` stream through VMEM and the
    per-row statistics accumulate in scratch."""
    b, n, d = h.shape
    v = w.shape[1]
    assert w.shape[0] == d
    if not can_fuse_projection(d, v):
        logits = (
            jnp.einsum("bnd,dv->bnv", h.astype(jnp.float32), w.astype(jnp.float32))
        )
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        return gumbel_sample_with_score(logits, seed, temperature, noise)

    vb = 1024 if v % 1024 == 0 else 512
    rows = b * n
    r_blk = _row_block(rows)
    # logits block + h block + double-buffered W must fit the VMEM budget
    while r_blk > 8 and (
        r_blk * vb * 4 + r_blk * d * h.dtype.itemsize + 2 * d * vb * w.dtype.itemsize
        > _PROJ_VMEM_BUDGET
    ):
        r_blk //= 2
    total = -(-rows // r_blk) * r_blk

    flat = h.reshape(rows, d)
    if total != rows:
        flat = jnp.pad(flat, ((0, total - rows), (0, 0)))
    bias2d = (
        bias.reshape(1, v)
        if bias is not None
        else jnp.zeros((1, v), jnp.float32)
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((r_blk, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, vb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, vb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    operands = [
        jnp.asarray(seed, jnp.int32).reshape(1),
        jnp.asarray(temperature, jnp.float32).reshape(1),
        flat,
        w,
        bias2d,
    ]
    if noise is not None:
        flat_noise = noise.reshape(rows, v).astype(jnp.float32)
        if total != rows:
            flat_noise = jnp.pad(
                flat_noise, ((0, total - rows), (0, 0)), constant_values=0.5
            )
        in_specs.append(
            pl.BlockSpec((r_blk, vb), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        )
        operands.append(flat_noise)

    grid = (total // r_blk, v // vb)
    ids, score = pl.pallas_call(
        functools.partial(_proj_kernel, has_noise=noise is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((r_blk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_blk, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total, 1), jnp.int32),
            jax.ShapeDtypeStruct((total, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((r_blk, 1), jnp.float32),  # running best gumbel value
            pltpu.VMEM((r_blk, 1), jnp.float32),  # logit at running argmax
            pltpu.VMEM((r_blk, 1), jnp.float32),  # online-softmax running max
            pltpu.VMEM((r_blk, 1), jnp.float32),  # online-softmax running sumexp
            pltpu.VMEM((r_blk, 1), jnp.int32),  # running argmax id
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * total * d * v,
            bytes_accessed=(
                total * d * h.dtype.itemsize
                + (total // r_blk) * d * v * w.dtype.itemsize
                + total * 8
            ),
            transcendentals=3 * total * v,
        ),
        interpret=_INTERPRET,
    )(*operands)
    ids = ids[:rows, 0].reshape(b, n)
    score = score[:rows, 0].reshape(b, n)
    return ids, score
