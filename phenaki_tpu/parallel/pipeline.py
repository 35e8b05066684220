"""Pipeline parallelism for the transformer stacks (GPipe schedule).

Beyond-reference capability (the reference's only distribution is
Accelerate DDP, cvivit_trainer.py:147-159): shard the LAYERS of a
scan-layers transformer over a 'pp' mesh axis so a model whose weights
don't fit one chip trains/samples across a pipeline of chips.

TPU-native design — no send/recv runtime, no schedule interpreter:

  * the stacked per-layer params (leading depth axis, transformer.py
    `scan_layers`) are sharded over 'pp' on that depth axis, so each device
    OWNS depth/S contiguous layers;
  * one `shard_map` + `lax.scan` over ticks implements the GPipe schedule:
    at each tick every stage runs its local layers on its current
    microbatch activation, then a single `ppermute` rotates activations to
    the next stage around the ICI ring. Stage 0 injects a fresh microbatch
    per tick; the last stage's outputs are collected from the scan ys.
  * reverse-mode autodiff differentiates straight through (ppermute's
    transpose is the reverse rotation), yielding the standard backward
    pipeline without writing one.

Bubble fraction is (S-1)/(M+S-1) for S stages and M microbatches — choose
M >= S. Warmup/drain ticks compute on garbage activations and their
outputs are discarded (the standard GPipe trade: wasted FLOPs for a
one-collective schedule).

Dropout is not supported inside the pipelined stack (deterministic only):
per-layer rng threading through the tick loop would change the rng stream
vs the reference layout. Training still differentiates (PEG/attention/FF
params all live inside).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phenaki_tpu.models.transformer import Transformer, TransformerLayer
from phenaki_tpu.ops.norms import LayerNorm

PIPE_AXIS = "pp"


def make_pipeline_mesh(
    pp: int, devices=None, dp: Optional[int] = None
) -> Mesh:
    """('dp', 'pp') mesh: batch over 'dp', layers over 'pp'."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % pp == 0, f"{n} devices % pp={pp}"
        dp = n // pp
    assert dp * pp == n
    return Mesh(np.asarray(devices).reshape(dp, pp), ("dp", PIPE_AXIS))


def _shard_stacked(stacked_params: Any, mesh: Mesh) -> Any:
    """Place the stacked layer params with depth (dim 0) over 'pp'."""
    def place(v):
        spec = P(PIPE_AXIS, *([None] * (v.ndim - 1)))
        return jax.device_put(v, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, stacked_params)


def pipeline_transformer_apply(
    transformer: Transformer,
    params: Any,  # Transformer param subtree: {'layers_scan': ..., 'norm_out': ...}
    x: jax.Array,  # (b, n, dim)
    mesh: Mesh,
    *,
    num_microbatches: Optional[int] = None,
    video_shape: Optional[Tuple[int, int, int, int]] = None,
    attn_bias: Optional[jax.Array] = None,
    context: Optional[jax.Array] = None,
    self_attn_mask: Optional[jax.Array] = None,
    cross_attn_context_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Pipelined equivalent of `transformer.apply` for scan-layers params.

    Bitwise-equivalent math to the sequential stack (same layer body module,
    same order); only the schedule differs. Batch must divide
    num_microbatches; depth must divide mesh.shape['pp']."""
    assert transformer.scan_layers, "pipeline needs scan_layers=True params"
    assert PIPE_AXIS in mesh.shape, f"mesh lacks a '{PIPE_AXIS}' axis"
    stages = mesh.shape[PIPE_AXIS]
    depth = transformer.depth
    assert depth % stages == 0, f"depth {depth} % pp {stages}"

    b = x.shape[0]
    m = num_microbatches if num_microbatches is not None else min(b, stages)
    assert b % m == 0, f"batch {b} % microbatches {m}"
    mb = b // m

    # layer body identical to the sequential path (transformer.py:187-204);
    # PEG sees the per-microbatch grid
    mb_video_shape = None
    if video_shape is not None:
        mb_video_shape = (mb, *video_shape[1:])
    cfg = transformer._layer_config(mb_video_shape, True)
    layer_mod = TransformerLayer(**cfg)

    stacked = params["layers_scan"]
    T = m + stages - 1

    # broadcast (non-pipelined) per-microbatch args: biases are shared,
    # batch-major args are microbatched alongside x
    x_mb = x.reshape(m, mb, *x.shape[1:])
    ctx_mb = (
        context.reshape(m, mb, *context.shape[1:]) if context is not None else None
    )
    sam_mb = (
        self_attn_mask.reshape(m, mb, *self_attn_mask.shape[1:])
        if self_attn_mask is not None
        else None
    )
    ccm_mb = (
        cross_attn_context_mask.reshape(m, mb, *cross_attn_context_mask.shape[1:])
        if cross_attn_context_mask is not None
        else None
    )

    stacked_specs = jax.tree_util.tree_map(
        lambda v: P(PIPE_AXIS, *([None] * (v.ndim - 1))), stacked
    )

    def run(local_stacked, x_mb, attn_bias, ctx_mb, sam_mb, ccm_mb):
        s = jax.lax.axis_index(PIPE_AXIS)

        def local_layers(act, bc):
            ctx_t, sam_t, ccm_t = bc

            def body(a, p_slice):
                return (
                    layer_mod.apply(
                        {"params": p_slice}, a, attn_bias, ctx_t, sam_t, ccm_t
                    ),
                    None,
                )

            act, _ = jax.lax.scan(body, act, local_stacked)
            return act

        def pick(mb_arr, t):
            if mb_arr is None:
                return None
            return jax.lax.dynamic_index_in_dim(
                mb_arr, jnp.clip(t, 0, m - 1), 0, keepdims=False
            )

        def tick(carry, t):
            act = carry
            # stage 0 injects microbatch t; later stages use the rotated act.
            # Every stage must see the RIGHT microbatch's broadcast args:
            # stage s processes microbatch (t - s)
            act = jnp.where(s == 0, pick(x_mb, t), act)
            t_mb = jnp.clip(t - s, 0, m - 1)
            bc = (pick(ctx_mb, t_mb), pick(sam_mb, t_mb), pick(ccm_mb, t_mb))
            act = local_layers(act, bc)
            out_t = act  # valid on the LAST stage for ticks >= stages-1
            act = jax.lax.ppermute(
                act, PIPE_AXIS, [(i, (i + 1) % stages) for i in range(stages)]
            )
            return act, out_t

        init = jnp.zeros_like(x_mb[0])
        _, outs = jax.lax.scan(tick, init, jnp.arange(T))
        # stage S-1 produced microbatch (t - (S-1)) at tick t
        valid = jax.lax.dynamic_slice_in_dim(outs, stages - 1, m, 0)
        # replicate the last stage's outputs to every stage
        valid = jax.lax.psum(
            jnp.where(s == stages - 1, valid, jnp.zeros_like(valid)), PIPE_AXIS
        )
        return valid

    specs_in = (
        stacked_specs,
        P(),  # x_mb replicated over pp (dp sharding can ride the leading axes)
        P() if attn_bias is not None else None,
        P() if ctx_mb is not None else None,
        P() if sam_mb is not None else None,
        P() if ccm_mb is not None else None,
    )
    specs_in = tuple(s if s is not None else P() for s in specs_in)

    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=P(),
        check_vma=False,
    )
    out = run_sharded(stacked, x_mb, attn_bias, ctx_mb, sam_mb, ccm_mb)
    out = out.reshape(b, *x.shape[1:])

    # final norm (tiny) runs replicated outside the pipeline
    norm = LayerNorm(transformer.dim, dtype=transformer.dtype)
    return norm.apply({"params": params["norm_out"]}, out)
