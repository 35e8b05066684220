"""Multi-process (multi-host) initialization — TPU-native replacement for the
reference's Accelerate process bootstrap (cvivit_trainer.py:147-159,
phenaki_trainer.py:272,292, which delegate to torch.distributed/NCCL).

On TPU pods each host runs the same program; `init_distributed` wires the
JAX distributed runtime so `jax.devices()` spans the whole slice and meshes /
collectives work across hosts. On a pod with the TPU plugin the coordinator
and topology are auto-detected from the environment; for CPU test clusters
(and the 2-process smoke test in tests/test_distributed.py) pass them
explicitly.

The rest of the multi-host story:
  * data: `DataLoader(num_shards=process_count, shard_id=process_index)`
    gives each process a disjoint interleaved slice of the same seeded
    shuffle (reference parity: Accelerate split_batches);
  * batches: `mesh.shard_batch` assembles per-process local arrays into
    global dp-sharded arrays via `jax.make_array_from_process_local_data`;
  * barriers / rank gating: SPMD makes barriers implicit; printing and
    artifact IO are gated on `is_main_process()` in the trainers;
  * checkpointing: Orbax coordinates multi-process save/restore natively.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[list] = None,
) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime and return
    (process_index, process_count).

    With no arguments, topology is auto-detected (TPU pod environments set
    the coordinator/process env vars); explicit arguments support CPU/GPU
    clusters and tests. Safe to call once per process, before any jax
    computation. No-ops when the runtime is already initialized or when
    running single-process with no coordinator configured.
    """
    already = False
    try:
        from jax._src import distributed as _dist

        already = _dist.global_state.client is not None
    except Exception:  # pragma: no cover - internal layout shifted
        pass

    if not already and (
        coordinator_address is not None or num_processes is not None
    ):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    elif not already:
        try:  # auto-detection path (TPU pod / cluster env vars)
            jax.distributed.initialize()
        except Exception:
            pass  # single process, nothing to wire
    return jax.process_index(), jax.process_count()


def is_main_process() -> bool:
    """Rank-0 predicate (reference `accelerator.is_main_process`)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()
