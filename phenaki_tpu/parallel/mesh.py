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


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    dp: Optional[int] = None,
    tp: int = 1,
) -> Mesh:
    """Build a ('dp', 'tp') mesh. Default: all devices on 'dp'."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        assert n % tp == 0
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
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


def param_partition_spec(path: Tuple, value: Any, tp_enabled: bool = True) -> P:
    """PartitionSpec for one param, from its pytree path."""
    names = []
    for k in path:
        if hasattr(k, "key"):
            names.append(str(k.key))
        elif hasattr(k, "name"):
            names.append(str(k.name))
        else:
            names.append(str(k))
    joined = "/".join(names)

    if tp_enabled:
        for pattern, spec in _TP_RULES:
            if re.match(pattern, joined):
                # scan-over-layers params carry a leading depth axis
                # (transformer.py scan_layers) — keep it replicated
                if "layers_scan" in joined and np.ndim(value) == len(spec) + 1:
                    spec = P(None, *spec)
                return spec  # divisibility checked by callers at shard time
    return P()


def shard_params(params: Any, mesh: Mesh, tp_enabled: bool = True) -> Any:
    """Place a param pytree on the mesh per the TP rules (replicated on dp)."""
    tp_size = mesh.shape[MODEL_AXIS]

    def place(path, value):
        spec = param_partition_spec(path, value, tp_enabled and tp_size > 1)
        # drop the tp axis if the dim doesn't divide
        fixed = []
        for i, axis_name in enumerate(spec):
            if axis_name is not None and value.shape[i] % tp_size != 0:
                fixed.append(None)
            else:
                fixed.append(axis_name)
        spec = P(*fixed) if fixed else P()
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def partition_specs_for(params: Any, mesh: Mesh, tp_enabled: bool = True) -> Any:
    """Pytree of PartitionSpecs mirroring `shard_params` placement."""
    tp_size = mesh.shape[MODEL_AXIS]

    def spec_of(path, value):
        spec = param_partition_spec(path, value, tp_enabled and tp_size > 1)
        fixed = []
        for i, axis_name in enumerate(spec):
            if axis_name is not None and value.shape[i] % tp_size != 0:
                fixed.append(None)
            else:
                fixed.append(axis_name)
        return P(*fixed) if fixed else P()

    return jax.tree_util.tree_map_with_path(spec_of, params)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over 'dp' (and 'dcn' when present),
    replicate over 'tp'.

    Falls back to replication when the batch doesn't divide the data axes
    (tiny eval batches); training batches should be a multiple of them.
    """
    data_axes = tuple(a for a in ("dcn", DATA_AXIS) if a in mesh.shape)
    total = int(np.prod([mesh.shape[a] for a in data_axes]))

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % total == 0:
            spec = P(data_axes, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
