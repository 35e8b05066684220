"""Multi-process topology tests (SURVEY.md §4: multi-host via jax.distributed
fake meshes). The 2-process smoke test launches real subprocesses joined
through `init_distributed` (local CPU cluster), shards the data per process,
and trains 2 steps through the actual CViViTTrainer."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from phenaki_tpu.data.datasets import DataLoader


def test_dataloader_process_sharding_disjoint_cover():
    """num_shards/shard_id: same seeded shuffle on every process, disjoint
    interleaved slices that cover the dataset."""
    data = [np.full((2, 2), i, np.float32) for i in range(10)]
    seen = []
    for shard in range(2):
        dl = DataLoader(
            data, batch_size=1, shuffle=True, seed=3, num_shards=2, shard_id=shard
        )
        assert len(dl) == 5
        for (batch,) in dl:
            seen.append(int(batch[0, 0, 0]))
    assert sorted(seen) == list(range(10))


def test_dataloader_sharding_drops_ragged_tail():
    data = [np.full((1,), i, np.float32) for i in range(9)]
    counts = []
    for shard in range(2):
        dl = DataLoader(
            data, batch_size=1, shuffle=False, num_shards=2, shard_id=shard
        )
        counts.append(sum(1 for _ in dl))
    assert counts == [4, 4], "both shards must see the same batch count"


_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
port = sys.argv[2]
results = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")

from phenaki_tpu.parallel.distributed import init_distributed, is_main_process

pi, pc = init_distributed(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)
assert pc == 2 and pi == proc_id, (pi, pc)
assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

import numpy as np
from phenaki_tpu.models.cvivit import CViViT
from phenaki_tpu.training.cvivit_trainer import CViViTTrainer

imgs = [np.random.RandomState(i).rand(16, 16, 3).astype(np.float32) for i in range(8)]
trainer = CViViTTrainer(
    CViViT(
        dim=32, codebook_size=64, image_size=16, patch_size=8,
        temporal_patch_size=2, spatial_depth=1, temporal_depth=1,
        dim_head=16, heads=2,
    ),
    num_train_steps=2,
    batch_size=4,  # global; 2 per process
    dataset=imgs,
    train_on_images=True,
    use_vgg_and_gan=False,
    valid_frac=0.0,
    save_results_every=10**9,
    save_model_every=10**9,
    results_folder=results + "/shared",  # SHARED: multi-process ckpt writes
    use_ema=True,
    seed=11,
)
losses = []
for _ in range(2):
    logs = trainer.train_step()
    losses.append(float(jax.device_get(logs["loss"])))
assert all(np.isfinite(l) for l in losses), losses

# SPMD invariant: replicated state must be identical across processes —
# print a param fingerprint for the parent to compare
leaf = jax.device_get(
    jax.tree_util.tree_leaves(trainer.state["vae_params"])[0]
)
fp_before = float(np.sum(np.asarray(leaf, np.float64)))
print(f"FINGERPRINT {fp_before:.10f}", flush=True)
print(f"LOSSES {losses[0]:.8f} {losses[1]:.8f}", flush=True)

# multi-process checkpoint: EVERY process enters save() (Orbax coordinates
# the write) and then restores — round-trip must be bitwise on the params
trainer.save(1)
trainer.checkpoints.wait()
before = jax.device_get(trainer.state["vae_params"])
trainer.load(1)
after = jax.device_get(trainer.state["vae_params"])
for a, b in zip(jax.tree_util.tree_leaves(before), jax.tree_util.tree_leaves(after)):
    assert np.array_equal(np.asarray(a), np.asarray(b))
print("CKPT_OK", flush=True)
print("WORKER_OK", flush=True)
"""


@pytest.mark.slow  # subprocess cluster spin-up + trainer compile
def test_two_process_cpu_training_smoke(tmp_path):
    """2 jax processes (local distributed cluster), 2 CPU devices each ->
    4-device dp mesh; the actual trainer runs 2 steps with per-process data
    shards and both processes converge on identical replicated state."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the worker script lives in tmp_path; make the repo importable
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port), str(tmp_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous: the workers compile serially and the suite may be
            # saturating the host's cores with other (interpret-mode) tests
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0 and "WORKER_OK" in out, (
            f"process {i} failed:\n{out[-3000:]}"
        )

    def grab(prefix, out):
        return [l for l in out.splitlines() if l.startswith(prefix)][0]

    # replicated params and losses identical across processes
    assert grab("FINGERPRINT", outs[0]) == grab("FINGERPRINT", outs[1])
    assert grab("LOSSES", outs[0]) == grab("LOSSES", outs[1])
    # both processes round-tripped the coordinated Orbax checkpoint
    assert all("CKPT_OK" in out for out in outs)
