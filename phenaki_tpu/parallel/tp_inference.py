"""Manual (shard_map) tensor parallelism for inference/sampling.

Training uses GSPMD: params carry Megatron PartitionSpecs (parallel/mesh.py
_TP_RULES) and XLA inserts the collectives. SAMPLING runs as one shard_map
program instead (models/phenaki.py) so the Pallas kernels (flash attention,
fused projection/sampling) operate on local shapes — GSPMD cannot partition
an opaque pallas_call. This module provides the pieces that make the decode
trunk tensor-parallel inside that shard_map:

  * `tp_local_module(m, tp)` — clone of a MaskGit/TokenCritic with the LOCAL
    head count (heads/tp), the LOCAL GEGLU width, and `tp_axis` set, so
    attention/FF complete their row-parallel outputs with one psum
    (ops/attention.py, ops/feedforward.py). The trunk then runs per-rank on
    1/tp of the heads/FF columns — a MaskGit bigger than one chip samples.
  * `pack_tp_params(params, tp)` — column-REPACKS the fused kernels whose
    halves a contiguous 1/tp column slice would split wrongly: to_kv is
    [K | V] (each rank needs its K AND V head slice) and proj_in is the
    GEGLU [a | g] (each output element pairs a_i with g_i). Packing reorders
    to rank-major [k_r | v_r] / [a_r | g_r] blocks — and zero-pads the GEGLU
    halves per rank when the reference inner width (int(4*2/3*dim), odd for
    dim 512) does not divide tp; gelu(0) * 0 = 0 rides zero rows of
    proj_out, so padding is exact. Everything else (to_q, to_out, null_kv,
    CPB net_out) is already contiguous per head.
  * `tp_param_specs(params, axis)` — the matching shard_map PartitionSpecs.

The vocab head (`to_logits`) and embeddings stay REPLICATED over tp: the
fused sampling kernel streams the 65536-wide projection per rank (identical
work, identical hardware-PRNG stream per seed), which keeps the decode scan
a single program. Vocab-parallel sampling (per-rank argmax + combine) is a
further optimization, not needed for correctness.
"""

from __future__ import annotations

import math
import re
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from phenaki_tpu.ops.feedforward import ff_inner_dim


def _path_str(path: Tuple) -> str:
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    return "/".join(names)


def tp_local_module(module, tp: int, axis: str = "tp"):
    """Local-shard clone of a MaskGit/TokenCritic (heads/tp heads, local
    GEGLU width, psum over `axis`). tp == 1 returns the module unchanged."""
    if tp == 1:
        return module
    assert module.heads % tp == 0, (
        f"heads ({module.heads}) must divide tp ({tp})"
    )
    inner = ff_inner_dim(module.dim)
    return module.clone(
        heads=module.heads // tp,
        tp_axis=axis,
        ff_inner_dim=-(-inner // tp),  # ceil: per-rank (padded) width
    )


def _repack_kv(w: jax.Array, tp: int) -> jax.Array:
    """[K | V] columns -> rank-major [k_0 | v_0 | k_1 | v_1 | ...]."""
    *lead, din, tot = w.shape
    inner = tot // 2
    assert inner % tp == 0, f"kv inner dim {inner} % tp {tp}"
    il = inner // tp
    w = w.reshape(*lead, din, 2, tp, il)
    w = jnp.swapaxes(w, -3, -2)  # (..., din, tp, 2, il)
    return w.reshape(*lead, din, tot)


def _repack_geglu_in(w: jax.Array, tp: int) -> jax.Array:
    """GEGLU [a | g] columns -> rank-major [a_r | g_r], each half zero-padded
    to ceil(inner/tp) per rank (exact: zero a-columns contribute nothing)."""
    *lead, din, tot = w.shape
    inner = tot // 2
    il = -(-inner // tp)
    pad = tp * il - inner
    a, g = jnp.split(w, 2, axis=-1)
    if pad:
        zeros = jnp.zeros((*lead, din, pad), w.dtype)
        a = jnp.concatenate([a, zeros], axis=-1)
        g = jnp.concatenate([g, zeros], axis=-1)
    a = a.reshape(*lead, din, tp, il)
    g = g.reshape(*lead, din, tp, il)
    return jnp.concatenate([a, g], axis=-1).reshape(*lead, din, 2 * tp * il)


def _pad_geglu_out(w: jax.Array, tp: int) -> jax.Array:
    """proj_out rows zero-padded to tp * ceil(inner/tp) (pad rows receive the
    gelu(0)*0 = 0 activations of the padded columns)."""
    *lead, inner, dout = w.shape
    il = -(-inner // tp)
    pad = tp * il - inner
    if not pad:
        return w
    zeros = jnp.zeros((*lead, pad, dout), w.dtype)
    return jnp.concatenate([w, zeros], axis=-2)


# (path regex, packer or None, spec over the TRAILING dims)
_TP_PACK_RULES = (
    (r".*to_q/kernel$", None, (None, "tp")),
    (r".*to_kv/kernel$", _repack_kv, (None, "tp")),
    (r".*proj_in/kernel$", _repack_geglu_in, (None, "tp")),
    (r".*to_out/kernel$", None, ("tp", None)),
    (r".*proj_out/kernel$", _pad_geglu_out, ("tp", None)),
    (r".*null_kv$", None, ("tp", None, None)),
    (r".*continuous_pos_bias/net_out/kernel$", None, (None, "tp")),
    (r".*continuous_pos_bias/net_out/bias$", None, ("tp",)),
)


def pack_tp_params(params: Any, tp: int) -> Any:
    """Repack a (global) MaskGit/TokenCritic param tree for contiguous 1/tp
    column sharding (jit-safe; pure reshapes/pads — autodiff transposes it,
    so it can also sit inside a training loss). tp == 1 is the identity."""
    if tp == 1:
        return params

    def pack(path, v):
        joined = _path_str(path)
        for pattern, packer, _ in _TP_PACK_RULES:
            if re.match(pattern, joined):
                return packer(v, tp) if packer is not None else v
        return v

    return jax.tree_util.tree_map_with_path(pack, params)


def tp_param_specs(params: Any, tp: int, axis: str = "tp") -> Any:
    """shard_map PartitionSpecs matching `pack_tp_params` output: sharded
    kernels get `axis` on their packed dim (leading scan-depth dims padded
    with None), everything else replicated."""

    def spec(path, v):
        if tp == 1:
            return P()
        joined = _path_str(path)
        for pattern, _, trailing in _TP_PACK_RULES:
            if re.match(pattern, joined):
                entries = [None] * (v.ndim - len(trailing)) + [
                    axis if t == "tp" else None for t in trailing
                ]
                return P(*entries)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)
