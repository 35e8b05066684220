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
M >= S. Warmup/drain ticks where a stage holds no real microbatch are
SKIPPED via `lax.cond` (no FLOPs burned on garbage activations; the stage
idles for the tick, which is the GPipe bubble either way).

Dropout: supported via an explicit `dropout_rng`. Each (microbatch, global
layer) pair gets `fold_in(fold_in(rng, microbatch), layer)` — a
well-defined, reproducible stream that is stage-count-invariant (the same
pp=1/pp=4 run draws identical noise), though intentionally NOT the same
stream as the sequential `nn.scan` path (which splits rngs differently).

Data parallelism composes: when the mesh also has a 'dp' axis (> 1), the
microbatch axis is sharded over it — each dp row runs an INDEPENDENT
pipeline over its m/dp local microbatches (batch m%(dp*?) constraint:
num_microbatches must divide by dp). Gradient all-reduce over dp happens
outside, in the optimizer step, exactly as for plain dp.

Tensor parallelism composes too: when the mesh also has a 'tp' axis (> 1),
each stage's layer body runs MANUAL Megatron TP — the stacked params are
column-repacked (parallel/tp_inference.pack_tp_params, differentiable pure
reshapes, so it sits inside the training loss) and each tp rank holds 1/tp
of the heads / GEGLU columns, completing attention/FF outputs with one psum
over 'tp' per block. The per-head attn bias (CPB) is sliced per rank by the
shard_map spec. Activations stay replicated over tp between blocks, so the
ppermute stage rotation is unchanged. Dropout draws the SAME stream on every
tp rank of a (dp, pp) position (masks are per-rank-shard local; the pipeline
stream already differs from the sequential path by construction).
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
MODEL_AXIS = "tp"


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
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Pipelined equivalent of `transformer.apply` for scan-layers params.

    Bitwise-equivalent math to the sequential stack (same layer body module,
    same order); only the schedule differs. Batch must divide
    num_microbatches; depth must divide mesh.shape['pp']. With
    `deterministic=False`, `dropout_rng` drives attention/FF dropout (see
    module docstring for the stream layout). A 'tp' mesh axis > 1 runs each
    stage's layer body tensor-parallel (module docstring)."""
    assert transformer.scan_layers, "pipeline needs scan_layers=True params"
    assert PIPE_AXIS in mesh.shape, f"mesh lacks a '{PIPE_AXIS}' axis"
    stages = mesh.shape[PIPE_AXIS]
    depth = transformer.depth
    assert depth % stages == 0, f"depth {depth} % pp {stages}"
    layers_per_stage = depth // stages
    if not deterministic:
        assert dropout_rng is not None, "dropout needs a dropout_rng"

    b = x.shape[0]
    dp = mesh.shape.get("dp", 1)
    # default: dp*stages microbatches — each dp row gets `stages`, the
    # minimum that fills its pipeline
    m = num_microbatches if num_microbatches is not None else min(b, dp * stages)
    assert b % m == 0, f"batch {b} % microbatches {m}"
    mb = b // m

    # dp composition: each dp row pipelines its own m/dp local microbatches
    assert m % dp == 0, (
        f"microbatches {m} must divide the dp axis ({dp}) — each dp row runs"
        " an independent pipeline over m/dp microbatches"
    )
    m_local = m // dp
    mb_spec = P("dp") if dp > 1 else P()

    # layer body identical to the sequential path (transformer.py:187-204);
    # PEG sees the per-microbatch grid
    mb_video_shape = None
    if video_shape is not None:
        mb_video_shape = (mb, *video_shape[1:])
    # parent=None detaches from any live flax module context — this function
    # is also called from INSIDE bound modules (MaskGit/TokenCritic route
    # their trunks here), where a bare construction would be intercepted as
    # a submodule assignment outside setup
    cfg = transformer._layer_config(mb_video_shape, deterministic)

    stacked = params["layers_scan"]

    # tensor parallelism: each stage's layer body runs as the LOCAL head /
    # GEGLU-column shard (module docstring). Params are repacked so a
    # contiguous 1/tp column slice keeps (k|v) / (a|g) pairs on one rank;
    # the repack is pure differentiable reshapes, safe inside a loss.
    tp = mesh.shape.get(MODEL_AXIS, 1)
    bias_spec = P()
    if tp > 1:
        from phenaki_tpu.ops.feedforward import ff_inner_dim
        from phenaki_tpu.parallel.tp_inference import (
            pack_tp_params,
            tp_param_specs,
        )

        assert cfg["heads"] % tp == 0, (
            f"heads ({cfg['heads']}) must divide tp ({tp})"
        )
        assert not cfg["causal"], (
            "causal ALiBi slopes are not head-sliced per tp rank yet"
        )
        inner = cfg["ff_inner_dim"] or ff_inner_dim(cfg["dim"], cfg["ff_mult"])
        cfg.update(
            heads=cfg["heads"] // tp,
            tp_axis=MODEL_AXIS,
            ff_inner_dim=-(-inner // tp),  # ceil: per-rank (padded) width
        )
        stacked = pack_tp_params(stacked, tp)
        if attn_bias is not None:
            assert attn_bias.shape[0] % tp == 0, (
                f"bias heads ({attn_bias.shape[0]}) % tp ({tp})"
            )
            bias_spec = P(MODEL_AXIS, *([None] * (attn_bias.ndim - 1)))

    layer_mod = TransformerLayer(**cfg, parent=None)
    T = m_local + stages - 1

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

    if tp > 1:
        # tp specs on the packed trailing dims, depth (dim 0) over 'pp'
        def _pp_tp_spec(spec: P, v) -> P:
            entries = list(spec) + [None] * (v.ndim - len(spec))
            assert entries[0] is None, "depth axis collided with a tp spec"
            entries[0] = PIPE_AXIS
            return P(*entries)

        stacked_specs = jax.tree_util.tree_map(
            _pp_tp_spec, tp_param_specs(stacked, tp, axis=MODEL_AXIS), stacked
        )
    else:
        stacked_specs = jax.tree_util.tree_map(
            lambda v: P(PIPE_AXIS, *([None] * (v.ndim - 1))), stacked
        )

    def run(local_stacked, x_mb, attn_bias, ctx_mb, sam_mb, ccm_mb, drop_rng):
        s = jax.lax.axis_index(PIPE_AXIS)
        dp_idx = jax.lax.axis_index("dp") if dp > 1 else 0

        def local_layers(act, bc, t_mb):
            ctx_t, sam_t, ccm_t = bc

            def body(a, xs):
                p_slice, local_i = xs
                rngs = None
                if not deterministic:
                    # (GLOBAL microbatch, GLOBAL layer) stream — stage- and
                    # dp-count invariant (see module docstring)
                    layer_idx = s * layers_per_stage + local_i
                    global_mb = dp_idx * m_local + t_mb
                    key = jax.random.fold_in(
                        jax.random.fold_in(drop_rng, global_mb), layer_idx
                    )
                    rngs = {"dropout": key}
                return (
                    layer_mod.apply(
                        {"params": p_slice}, a, attn_bias, ctx_t, sam_t, ccm_t,
                        rngs=rngs,
                    ),
                    None,
                )

            act, _ = jax.lax.scan(
                body, act, (local_stacked, jnp.arange(layers_per_stage))
            )
            return act

        def pick(mb_arr, t):
            if mb_arr is None:
                return None
            return jax.lax.dynamic_index_in_dim(
                mb_arr, jnp.clip(t, 0, m_local - 1), 0, keepdims=False
            )

        def tick(carry, t):
            act = carry
            # stage 0 injects microbatch t; later stages use the rotated act.
            # Every stage must see the RIGHT microbatch's broadcast args:
            # stage s processes microbatch (t - s)
            act = jnp.where(s == 0, pick(x_mb, t), act)
            t_mb_raw = t - s
            t_mb = jnp.clip(t_mb_raw, 0, m_local - 1)
            bc = (pick(ctx_mb, t_mb), pick(sam_mb, t_mb), pick(ccm_mb, t_mb))
            # warmup/drain ticks hold no real microbatch on this stage —
            # skip the layer FLOPs entirely (the stage idles in the bubble)
            valid = (t_mb_raw >= 0) & (t_mb_raw < m_local)
            act = jax.lax.cond(
                valid,
                lambda a: local_layers(a, bc, t_mb),
                lambda a: a,
                act,
            )
            out_t = act  # valid on the LAST stage for ticks >= stages-1
            act = jax.lax.ppermute(
                act, PIPE_AXIS, [(i, (i + 1) % stages) for i in range(stages)]
            )
            return act, out_t

        init = jnp.zeros_like(x_mb[0])
        _, outs = jax.lax.scan(tick, init, jnp.arange(T))
        # stage S-1 produced microbatch (t - (S-1)) at tick t
        valid = jax.lax.dynamic_slice_in_dim(outs, stages - 1, m_local, 0)
        # replicate the last stage's outputs to every stage
        valid = jax.lax.psum(
            jnp.where(s == stages - 1, valid, jnp.zeros_like(valid)), PIPE_AXIS
        )
        return valid

    specs_in = (
        stacked_specs,
        mb_spec,  # microbatch axis sharded over dp (replicated over pp)
        bias_spec,  # per-head bias: head dim sliced per tp rank (P() else)
        mb_spec if ctx_mb is not None else None,
        mb_spec if sam_mb is not None else None,
        mb_spec if ccm_mb is not None else None,
        P(),  # dropout rng replicated
    )
    specs_in = tuple(s if s is not None else P() for s in specs_in)

    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)  # unused when deterministic

    run_sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=specs_in,
        out_specs=mb_spec,
        check_vma=False,
    )
    out = run_sharded(
        stacked, x_mb, attn_bias, ctx_mb, sam_mb, ccm_mb, dropout_rng
    )
    out = out.reshape(b, *x.shape[1:])

    # final norm (tiny) runs replicated outside the pipeline
    norm = LayerNorm(transformer.dim, dtype=transformer.dtype, parent=None)
    return norm.apply({"params": params["norm_out"]}, out)
