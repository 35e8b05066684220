"""Device mesh + sharding layer (TPU-native replacement for the reference's
Accelerate/NCCL DDP, reference cvivit_trainer.py:147-159 etc — SURVEY.md §5.8).

The reference's only distribution strategy is data parallelism with implicit
all-reduce inside `accelerator.backward`. Here:

  * a 2-D `Mesh` over ('dp', 'tp') axes: data parallelism over 'dp' (batch
    sharded, gradients all-reduced by XLA over ICI), tensor parallelism over
    'tp' (attention heads / FF hidden / vocab sharded — Megatron-style
    column/row splits expressed as PartitionSpecs on the param pytree);
  * `wait_for_everyone` barriers, rank gating, and state-dict consolidation
    all disappear: SPMD under jit is synchronous by construction and Orbax
    handles distributed save/restore.

Param placement is rule-based over the flax param-path names rather than via
flax logical-axis machinery — the partition function is pure data
(path -> PartitionSpec) and unit-testable without a real slice.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"
PIPE_AXIS = "pp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    tp: int = 1,
    pp: int = 1,
) -> Mesh:
    """Build a ('dp', 'tp') mesh — or ('dp', 'tp', 'pp') when `pp > 1`
    (transformer layers sharded over 'pp', GPipe schedule: parallel/pipeline).
    Default: all devices on 'dp'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % (tp * pp) == 0
        dp = n // (tp * pp)
    assert dp * tp * pp == n, (
        f"dp({dp}) * tp({tp}) * pp({pp}) != device count ({n})"
    )
    if pp > 1:
        arr = np.asarray(devices).reshape(dp, tp, pp)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_multislice_mesh(
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('dcn', 'dp', 'tp') mesh for multi-slice pods: data parallelism over
    the cross-slice DCN axis (gradient all-reduce is the only cross-slice
    collective and tolerates DCN latency), dp+tp within each slice so tensor-
    parallel collectives ride ICI. Falls back to a single-slice ('dcn'=1)
    layout when slice topology is unavailable (CPU test meshes).

    Batches should shard over ('dcn', 'dp') jointly — `shard_batch` treats
    the leading axes of this mesh accordingly when given a 3-axis mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = sorted({getattr(d, "slice_index", 0) for d in devices})
    num_slices = len(slice_ids)
    per_slice = len(devices) // num_slices
    assert per_slice % tp == 0, f"per-slice devices ({per_slice}) % tp ({tp})"

    by_slice = [
        [d for d in devices if getattr(d, "slice_index", 0) == s]
        for s in slice_ids
    ]
    arr = np.asarray(by_slice).reshape(num_slices, per_slice // tp, tp)
    return Mesh(arr, ("dcn", DATA_AXIS, MODEL_AXIS))


# --------------------------------------------------------------------------- #
# param partitioning rules                                                    #
# --------------------------------------------------------------------------- #

# (regex over '/'-joined param path, partition spec builder)
# Megatron-style: qkv/ff-in are column-parallel (shard output dim on tp),
# attn-out/ff-out are row-parallel (shard input dim), embeddings/vocab heads
# shard the embedding table rows or logits dim. Everything else replicated.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*(to_q|to_kv)/kernel$", P(None, MODEL_AXIS)),
    (r".*proj_in/kernel$", P(None, MODEL_AXIS)),  # FF in (GEGLU)
    (r".*to_out/kernel$", P(MODEL_AXIS, None)),
    (r".*proj_out/kernel$", P(MODEL_AXIS, None)),  # FF out
    (r".*to_logits/kernel$", P(None, MODEL_AXIS)),  # vocab-parallel head
    (r".*token_emb/embedding$", P(None, None)),
    (r".*pos_emb/embedding$", P(None, None)),
)


def _spans_processes(mesh: Mesh) -> bool:
    return jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )


def _put(value: Any, sharding, *, copy: bool = False) -> jax.Array:
    """device_put that also works when the sharding spans processes: each
    process supplies its addressable shards from the (host-identical) value
    via make_array_from_callback. Non-mesh shardings (e.g. SingleDevice from
    a jitted init) are by construction process-local.

    `copy=True` forbids aliasing the input buffer (may_alias=False) — used
    for trainer state creation, whose jitted steps DONATE the state: an
    aliased placement (device_put onto the same device is a no-op) would
    let the first step delete the caller's arrays (e.g. Phenaki.params)."""
    mesh = getattr(sharding, "mesh", None)
    if mesh is not None and _spans_processes(mesh):
        arr = np.asarray(value)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )
    if copy:
        return jax.device_put(value, sharding, may_alias=False)
    return jax.device_put(value, sharding)


# FSDP: params/opt-state below this many elements stay replicated — sharding
# tiny biases/scales over dp costs an all-gather each use for no memory win
_FSDP_MIN_SIZE = 2**16


def param_partition_spec(
    path: Tuple, value: Any, tp_enabled: bool = True, fsdp_size: int = 1,
    pp_size: int = 1,
) -> P:
    """PartitionSpec for one param, from its pytree path.

    With `fsdp_size > 1`, params (and through the jitted optimizer init,
    Adam moments) additionally shard their largest still-unsharded dim over
    the 'dp' axis — ZeRO-3-style fully sharded data parallelism, the
    TPU-native equivalent of torch FSDP: XLA all-gathers each param just
    before use and reduce-scatters its gradient, both riding ICI. Composes
    with the Megatron TP rules (a qkv kernel can be tp on dim 1 and fsdp on
    dim 0). Beyond the reference's capability set (Accelerate DDP only,
    cvivit_trainer.py:147-159)."""
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    joined = "/".join(names)

    spec = P()
    if tp_enabled:
        for pattern, tp_spec in _TP_RULES:
            if re.match(pattern, joined):
                # scan-over-layers params carry a leading depth axis
                # (transformer.py scan_layers) — keep it replicated
                if "layers_scan" in joined and np.ndim(value) == len(tp_spec) + 1:
                    tp_spec = P(None, *tp_spec)
                spec = tp_spec  # divisibility checked by callers at shard time
                break

    # pipeline parallelism: stacked per-layer params shard their depth axis
    # (dim 0) over 'pp' — each stage owns depth/pp contiguous layers
    # (parallel/pipeline.py GPipe schedule)
    if (
        pp_size > 1
        and "layers_scan" in joined
        and np.ndim(value) >= 1
        and value.shape[0] % pp_size == 0
    ):
        entries = list(spec) + [None] * (np.ndim(value) - len(spec))
        if entries[0] is None:
            entries[0] = PIPE_AXIS
            spec = P(*entries)

    if fsdp_size > 1 and np.ndim(value) >= 1 and np.size(value) >= _FSDP_MIN_SIZE:
        entries = list(spec) + [None] * (np.ndim(value) - len(spec))
        # largest divisible unsharded dim; skip a scanned depth axis (dim 0
        # of layers_scan params) — scan slices it per layer, and sharding it
        # would turn every layer step into a cross-device dynamic-slice
        start = 1 if "layers_scan" in joined else 0
        cands = [
            i
            for i in range(start, np.ndim(value))
            if entries[i] is None and value.shape[i] % fsdp_size == 0
        ]
        if cands:
            dim = max(cands, key=lambda i: value.shape[i])
            entries[dim] = DATA_AXIS
            spec = P(*entries)
    return spec


def _fixed_spec(spec: P, value: Any, tp_size: int) -> P:
    """Drop the tp axis on dims that don't divide (fsdp dims pre-checked)."""
    fixed = []
    for i, axis_name in enumerate(spec):
        if axis_name == MODEL_AXIS and value.shape[i] % tp_size != 0:
            fixed.append(None)
        else:
            fixed.append(axis_name)
    return P(*fixed) if fixed else P()


def shard_params(
    params: Any, mesh: Mesh, tp_enabled: bool = True, fsdp: bool = False,
    copy: bool = False,
) -> Any:
    """Place a param pytree on the mesh per the TP rules (replicated on dp
    unless `fsdp`, which additionally shards each large param over 'dp').
    `copy=True` forces fresh buffers (required when the result will be
    DONATED by a jitted train step — see _put)."""
    tp_size = mesh.shape[MODEL_AXIS]
    fsdp_size = mesh.shape[DATA_AXIS] if fsdp else 1
    pp_size = mesh.shape.get(PIPE_AXIS, 1)

    def place(path, value):
        spec = param_partition_spec(
            path, value, tp_enabled and tp_size > 1, fsdp_size, pp_size
        )
        return _put(
            value, NamedSharding(mesh, _fixed_spec(spec, value, tp_size)),
            copy=copy,
        )

    return jax.tree_util.tree_map_with_path(place, params)


def partition_specs_for(
    params: Any, mesh: Mesh, tp_enabled: bool = True, fsdp: bool = False
) -> Any:
    """Pytree of PartitionSpecs mirroring `shard_params` placement."""
    tp_size = mesh.shape[MODEL_AXIS]
    fsdp_size = mesh.shape[DATA_AXIS] if fsdp else 1
    pp_size = mesh.shape.get(PIPE_AXIS, 1)

    def spec_of(path, value):
        spec = param_partition_spec(
            path, value, tp_enabled and tp_size > 1, fsdp_size, pp_size
        )
        return _fixed_spec(spec, value, tp_size)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def shard_like_params(
    tree: Any, params: Any, mesh: Mesh, tp_enabled: bool = True,
    fsdp: bool = False, copy: bool = False,
) -> Any:
    """Place a pytree derived from `params` (optimizer state, EMA) on the
    mesh: every subtree congruent with `params` (same treedef — Adam's
    mu/nu, an EMA copy) gets the exact param placements; all other leaves
    (step counters, accumulators of other shapes) are replicated.

    Needed because `jax.jit(opt.init)` does NOT propagate input shardings
    to its outputs (zeros_like is a broadcast with no operand sharding to
    inherit — outputs come back single-device), so optimizer moments must
    be placed explicitly to match tp/fsdp params."""
    specs = partition_specs_for(params, mesh, tp_enabled, fsdp)
    params_treedef = jax.tree_util.tree_structure(params)
    repl = NamedSharding(mesh, P())

    def is_params_like(node):
        try:
            return (
                jax.tree_util.tree_structure(node) == params_treedef
                and not params_treedef.num_leaves == 0
            )
        except Exception:
            return False

    def place_node(node):
        if is_params_like(node):
            return jax.tree_util.tree_map(
                lambda v, s: _put(v, NamedSharding(mesh, s), copy=copy),
                node, specs,
            )
        return jax.tree_util.tree_map(lambda v: _put(v, repl, copy=copy), node)

    return jax.tree_util.tree_map(place_node, tree, is_leaf=is_params_like)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over 'dp' (and 'dcn' when present),
    replicate over 'tp'.

    Single-process: `batch` is the global batch, placed with device_put.
    Multi-process (mesh spans hosts): `batch` is each process's LOCAL slice
    (from a process-sharded DataLoader); the global array is assembled with
    `jax.make_array_from_process_local_data` — the SPMD equivalent of the
    reference's Accelerate split_batches + DDP input scatter.

    Falls back to replication when the batch doesn't divide the data axes
    (tiny eval batches); training batches should be a multiple of them.
    """
    data_axes = tuple(a for a in ("dcn", DATA_AXIS) if a in mesh.shape)
    total = int(np.prod([mesh.shape[a] for a in data_axes]))
    pc = jax.process_count()
    multiprocess = pc > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )

    def place(x):
        if multiprocess:
            x = np.asarray(x)
            global_rows = x.shape[0] * pc if x.ndim >= 1 else 0
            if x.ndim >= 1 and global_rows % total == 0:
                spec = P(data_axes, *([None] * (x.ndim - 1)))
                return jax.make_array_from_process_local_data(
                    NamedSharding(mesh, spec), x, (global_rows, *x.shape[1:])
                )
            # replicated: every process must pass identical data
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), x, x.shape
            )
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % total == 0:
            spec = P(data_axes, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh, copy: bool = False) -> Any:
    """Fully replicate a pytree across the mesh (multi-process safe)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: _put(x, sharding, copy=copy), tree)


def ensure_on_mesh(tree: Any, mesh: Mesh) -> Any:
    """Leave leaves already sharded on `mesh` untouched; replicate everything
    else onto it. Used after `jax.jit(opt.init)(sharded_params)` — the moments
    inherit the param shardings, but freshly created scalars (step counters)
    can come out committed to a single device, which later conflicts with
    mesh-placed arguments in one jitted call."""
    repl = NamedSharding(mesh, P())

    def fix(x):
        sh = getattr(x, "sharding", None)
        if getattr(sh, "mesh", None) is mesh or (
            hasattr(sh, "mesh") and sh.mesh == mesh
        ):
            return x
        return _put(x, repl)

    return jax.tree_util.tree_map(fix, tree)


def fully_addressable(tree: Any) -> bool:
    """True when every jax.Array leaf is fully addressable from this process
    (single-host, or replicated). Cross-host-sharded (fsdp multi-host) state
    cannot be jax.device_get on one process — callers use this to gate
    host-side consumers (sample artifacts, eval copies)."""
    ok = True
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            ok = False
            break
    return ok


def place_like(template: Any, values: Any) -> Any:
    """Place each leaf of `values` with the matching `template` leaf's
    sharding — used to restore checkpoints onto TP/DP placements without
    re-deriving partition specs (equals replication on a dp-only mesh)."""
    return jax.tree_util.tree_map(
        lambda t, v: _put(jnp.asarray(v), t.sharding), template, values
    )
