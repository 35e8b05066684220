"""Ring attention: sequence-sharded QK-norm attention over a mesh axis.

The reference achieves long video purely algorithmically (prime-frame
chaining, SURVEY.md §5.7) — context/sequence parallelism is absent. This is
the TPU-native extension the build plan calls for: when one scene's token
sequence outgrows a chip (longer scenes, larger grids), shard the sequence
over a mesh axis and compute exact attention blockwise, rotating K/V shards
around the ring with `lax.ppermute` while online-softmax statistics (m, l)
accumulate on-chip — the full (N, N) score matrix never exists anywhere.

Same math as ops.attention.qk_norm_attention (fp32 softmax, additive bias,
key masking, causal), verified against the dense op in tests on the virtual
8-device mesh. Use under `shard_map` with q/k/v sharded on the sequence axis:

    out = shard_map(
        partial(ring_qk_norm_attention, axis_name="sp", scale=8.0),
        mesh=mesh, in_specs=(P(None, None, "sp", None),) * 3,
        out_specs=P(None, None, "sp", None),
    )(q, k, v)

Communication rides the ICI ring (one K/V shard per step, overlapping the
per-block compute); each chip holds O(N/sp) keys at any moment.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_qk_norm_attention(
    q: jax.Array,  # (b, h, nq_local, d) — local sequence shard
    k: jax.Array,  # (b, h, nk_local, d)
    v: jax.Array,  # (b, h, nk_local, d)
    *,
    axis_name: str,
    scale: float = 8.0,
    attn_bias: Optional[jax.Array] = None,  # (h, nq_local, N_global) or None
    key_mask_add: Optional[jax.Array] = None,  # (b, N_global) additive f32
    causal: bool = False,
    null_k: Optional[jax.Array] = None,  # (b, h, nkv, d) replicated
    null_v: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact attention with K/V ring rotation; call inside shard_map.

    `attn_bias` rows are the LOCAL queries, columns the GLOBAL keys (each
    shard holds its own row-slice of the full bias — O(N^2/sp) per chip).
    `key_mask_add` is replicated (b, N_global) additive floats (0 / -inf).
    """
    b, h, nq, d = q.shape
    nk = k.shape[2]
    sp = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)

    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def attend_block(step, m, l, acc, k_cur, v_cur):
        # after `step` rotations we hold the shard of (my_idx - step) mod sp
        owner = jax.lax.rem(my_idx - step + sp, sp)
        k_off = owner * nk

        s = jnp.einsum(
            "bhid,bhjd->bhij", q, k_cur, preferred_element_type=jnp.float32
        ) * scale

        if attn_bias is not None:
            blk = jax.lax.dynamic_slice_in_dim(
                attn_bias.astype(jnp.float32), k_off, nk, axis=-1
            )
            s = s + blk[None]

        if key_mask_add is not None:
            mblk = jax.lax.dynamic_slice_in_dim(
                key_mask_add.astype(jnp.float32), k_off, nk, axis=-1
            )
            s = s + mblk[:, None, None, :]

        if causal:
            row = jnp.arange(nq)[:, None] + my_idx * nq
            col = jnp.arange(nk)[None, :] + k_off
            s = jnp.where(col <= row, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)

        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhij,bhjd->bhid",
            p.astype(v_cur.dtype),
            v_cur,
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    def body(step, carry):
        m, l, acc, k_cur, v_cur = carry
        m, l, acc = attend_block(step, m, l, acc, k_cur, v_cur)
        # rotate K/V to the next chip
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return m, l, acc, k_nxt, v_nxt

    m0 = jnp.full((b, h, nq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, nq, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, nq, d), jnp.float32)

    # sp-1 rotating steps, then the final block WITHOUT the last rotation
    # (whose result nobody reads — it would waste a full K/V ICI round)
    m, l, acc, k_last, v_last = jax.lax.fori_loop(
        0, sp - 1, body, (m0, l0, acc0, k, v)
    )
    m, l, acc = attend_block(sp - 1, m, l, acc, k_last, v_last)

    if null_k is not None:
        # learned null keys/values (replicated params): one extra local
        # block, no bias/mask/causal — gives cross-attn-style robustness
        # to sequence-sharded self-attention stacks
        s = jnp.einsum(
            "bhid,bhjd->bhij", q, null_k, preferred_element_type=jnp.float32
        ) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bhij,bhjd->bhid",
            p.astype(null_v.dtype),
            null_v,
            preferred_element_type=jnp.float32,
        )

    out = acc / jnp.maximum(l, 1e-30)
    return out.astype(q.dtype)


def ring_flash_qk_attention(
    q: jax.Array,  # (b, h, nq_local, d) — local sequence shard
    k: jax.Array,  # (b, h, nk_local, d)
    v: jax.Array,
    *,
    axis_name: str,
    scale: float = 8.0,
    attn_bias: Optional[jax.Array] = None,  # (h, nq_local, N_global)
    key_mask_add: Optional[jax.Array] = None,  # (b, N_global) additive f32
    causal: bool = False,
    null_k: Optional[jax.Array] = None,  # (b, h, nkv, d) replicated
    null_v: Optional[jax.Array] = None,
) -> jax.Array:
    """Ring attention through the bounded-shift flash kernel.

    Cosine attention's softmax shift is a GLOBAL score bound, so it survives
    sequence sharding: one pmax over the per-shard Cauchy-Schwarz bounds
    gives every chip the same c2, after which each rotation's Pallas chunk
    returns a raw [sum p*v | sum p] accumulator that ADDS across the ring —
    the online-softmax (m, l) rescale the XLA ring needs per block
    disappears, exactly as it did on one chip (ops/pallas_attention.py).
    Differentiable end to end (chunk custom-VJP kernels + ppermute
    transposes); for training long sequences wrap the caller in
    `jax.checkpoint` so the backward re-rotates K/V instead of stashing
    every rotation (O(N/sp) memory, one extra ring of compute).

    Optional learned null keys/values (replicated across shards) are folded
    in as one extra local XLA block so cross-attn-style null-KV stacks can
    sequence-shard (round-3 review #5).
    """
    from phenaki_tpu.ops import pallas_attention as pa

    b, h, nq, d = q.shape
    nk = k.shape[2]
    sp = jax.lax.psum(1, axis_name)  # static: the mesh axis size
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    # global bound over the SCALED q and raw k; stop-grad (the normalized
    # output is invariant to c2, so a zero cotangent is exact)
    # stop-grad BEFORE the pmax (pmax has no differentiation rule, and the
    # normalized output is invariant to c2 so a zero cotangent is exact)
    q32 = jax.lax.stop_gradient(q).astype(jnp.float32) * scale
    k32 = jax.lax.stop_gradient(k).astype(jnp.float32)
    qn = jnp.sqrt(jnp.max(jnp.sum(q32 * q32, axis=-1)))
    kn = jnp.sqrt(jnp.max(jnp.sum(k32 * k32, axis=-1)))
    qn = jax.lax.pmax(qn, axis_name)
    kn = jax.lax.pmax(kn, axis_name)
    c2 = (qn * kn * pa.LOG2E).reshape(1, 1)

    d_aug = pa._round_up(d + 1, 128)
    raw = jnp.zeros((b, h, nq, d_aug), jnp.float32)
    k_cur, v_cur = k, v
    # unrolled: sp is static, and static unrolling keeps each chunk's Pallas
    # launch specializable (the causal offsets stay runtime SMEM scalars)
    for step in range(sp):
        owner = jax.lax.rem(my - step + sp, sp)
        k_off = owner * nk
        bias_blk = None
        if attn_bias is not None:
            bias_blk = jax.lax.dynamic_slice_in_dim(
                attn_bias, k_off, nk, axis=-1
            )
        kmask_blk = None
        if key_mask_add is not None:
            kmask_blk = jax.lax.dynamic_slice_in_dim(
                key_mask_add.astype(jnp.float32), k_off, nk, axis=-1
            )
        offsets = (
            jnp.stack([my * nq, k_off]).astype(jnp.int32) if causal else None
        )
        raw = raw + pa.flash_attend_chunk(
            q, k_cur, v_cur, bias_blk, kmask_blk, c2, offsets, scale, causal
        )
        if step < sp - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)

    if null_k is not None:
        # null block shares the same shift so its raw stats add directly
        # (q NOT stop-gradded here — only the bound is)
        s = jnp.einsum(
            "bhid,bhjd->bhij", q, null_k,
            preferred_element_type=jnp.float32,
        ) * scale
        p = jnp.exp2(s * pa.LOG2E - c2[0, 0])
        raw = raw.at[..., :d].add(
            jnp.einsum(
                "bhij,bhjd->bhid", p.astype(null_v.dtype), null_v,
                preferred_element_type=jnp.float32,
            )
        )
        raw = raw.at[..., d : d + 1].add(jnp.sum(p, axis=-1, keepdims=True))

    l = jnp.maximum(raw[..., d : d + 1], 1e-37)
    return (raw[..., :d] / l).astype(q.dtype)


# Ring-length crossover for the flash path. The flash ring unrolls its
# rotation loop statically (one Pallas launch per step keeps the causal
# offsets runtime SMEM scalars), which multiplies compiled-program size by
# the ring length — measured at sp=8: 6.2 s / 308.5 KB optimized HLO vs the
# XLA fori_loop ring's 0.61 s / 35.3 KB (examples/ring_timing.py
# --cpu-compile). The growth is linear in sp, so past this cap we route to
# the XLA online-softmax ring, whose program size is sp-independent. At
# such ring lengths each chip's K/V block is small and the attend is
# ppermute-latency-bound anyway, so the kernel advantage has thinned.
FLASH_RING_MAX_SP = 16


def _ring_use_flash(local_rows: int, dim_head: int, sp: int = 1) -> bool:
    """Same gating as the dense path (ops/attention.py _use_flash): TPU (or
    test interpret mode), dim_head that fits a VMEM block, enough local rows,
    and a ring short enough that the static unroll stays cheap."""
    from phenaki_tpu.ops import pallas_attention as pa

    if dim_head > 128 or local_rows < 64 or sp > FLASH_RING_MAX_SP:
        return False
    if pa._INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def sequence_sharded_attention(
    q: jax.Array,  # (b, h, N, d) global
    k: jax.Array,
    v: jax.Array,
    mesh,
    *,
    axis_name: str = "dp",
    scale: float = 8.0,
    attn_bias: Optional[jax.Array] = None,  # (h, N, N) global
    key_mask: Optional[jax.Array] = None,  # (b, N) bool
    causal: bool = False,
    null_k: Optional[jax.Array] = None,  # (b, h, nkv, d) replicated
    null_v: Optional[jax.Array] = None,
) -> jax.Array:
    """Convenience wrapper: shard the sequence axis of q/k/v (and the bias
    rows) over `axis_name` and run ring attention. N must divide the axis.

    On TPU the per-rotation attend runs the bounded-shift Pallas flash
    kernel (`ring_flash_qk_attention`) — the VPU-softmax bottleneck the
    dense flash kernel eliminated does not reappear where sequences are
    longest (round-3 review #5). Elsewhere the exact XLA online-softmax
    ring is used. Optional null keys/values (replicated) are supported on
    both paths."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    sp = mesh.shape[axis_name]
    n = q.shape[2]
    assert n % sp == 0, f"sequence length {n} must divide the {axis_name} axis ({sp})"

    key_mask_add = None
    if key_mask is not None:
        key_mask_add = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)

    import functools

    ring_fn = (
        ring_flash_qk_attention
        if _ring_use_flash(n // sp, q.shape[-1], sp)
        else ring_qk_norm_attention
    )
    fn = functools.partial(
        ring_fn,
        axis_name=axis_name,
        scale=scale,
        causal=causal,
    )

    def wrapped(q, k, v, bias, kmask, nk_, nv_):
        return fn(
            q, k, v, attn_bias=bias, key_mask_add=kmask, null_k=nk_,
            null_v=nv_,
        )

    seq = P(None, None, axis_name, None)
    # None operands are empty pytrees: their spec entry is never consulted,
    # so P() stands in (shard_map prefix-broadcasts over zero leaves)
    bias_spec = P(None, axis_name, None) if attn_bias is not None else P()
    kmask_spec = P()
    in_specs = (seq, seq, seq, bias_spec, kmask_spec, P(), P())
    out = shard_map(
        wrapped,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=seq,
        check_vma=False,
    )(q, k, v, attn_bias, key_mask_add, null_k, null_v)
    return out
