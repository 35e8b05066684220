"""On-chip ring-attention timing (round-4 review #7).

Two measurements back the BASELINE.md ring-attention row:

1. TPU (default): degenerate single-shard ring — `sequence_sharded_attention`
   on a 1-device ('sp',) mesh, which runs `ring_flash_qk_attention` with
   sp=1 (one Pallas chunk launch, the pmax/ppermute collectives degenerate)
   — against the dense flash kernel (`qk_norm_attention`) on the SAME
   tensors, both timed in-jit with `lax.scan` repetition on
   iteration-dependent inputs. The delta is the ring machinery's fixed
   overhead (global-bound pmax, raw-accumulator layout, final normalize)
   with zero communication, i.e. the per-chip cost floor of sequence
   parallelism.

2. --cpu-compile: sp=8 compile-cost note on the virtual CPU mesh — the
   flash ring unrolls its rotation loop statically (ring_attention.py:198,
   one Pallas launch per step so causal offsets stay SMEM scalars) while
   the XLA online-softmax ring uses `fori_loop`. This mode lowers+compiles
   both at sp=8 and reports compile seconds and optimized-HLO bytes,
   quantifying what the unroll costs at ring length 8. Run it as
       XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python examples/ring_timing.py --cpu-compile

Shape matches the MaskGit flagship trunk: b=4, heads=8, n=1152, d_head=64.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B, H, N, D = 4, 8, 1152, 64


def _inputs(key):
    import jax
    import jax.numpy as jnp

    from phenaki_tpu.ops.norms import l2norm

    kq, kk, kv = jax.random.split(key, 3)
    # L2-normalized q/k like the attention module hands the core
    q = l2norm(jax.random.normal(kq, (B, H, N, D), jnp.bfloat16))
    k = l2norm(jax.random.normal(kk, (B, H, N, D), jnp.bfloat16))
    v = jax.random.normal(kv, (B, H, N, D), jnp.bfloat16)
    return q, k, v


def _time_injit(fn, q, k, v, reps=64):
    """In-jit timing with an honest completion barrier.

    `lax.scan` over the body with a per-iteration scalar perturbation so
    XLA cannot hoist it; the barrier FETCHES the scalar result
    (`device_get`) because on the axon tunnel backend
    `block_until_ready` returns as soon as the execute RPC is enqueued —
    a bare-barrier timing here measures dispatch, not the kernel (bench.py
    `_fetch_scalar` has the same workaround). The fetch rides one ~28 ms
    tunnel round trip, which at this kernel's ~0.1 ms scale would swamp
    the measurement, so we time at `reps` and `3*reps` and difference:
    per-rep = (t(3r) - t(r)) / (2r), cancelling the RTT and any fixed
    dispatch cost exactly.
    """
    import jax
    import jax.numpy as jnp
    import numpy as _np
    from jax import lax

    @jax.jit
    def run(q, k, v, scales):
        def body(c, s):
            out = fn(q * s, k, v)
            return c + out.astype(jnp.float32).sum(), None

        s, _ = lax.scan(body, jnp.float32(0), scales)
        return s

    def once(n):
        scales = (1.0 + jnp.arange(n, dtype=jnp.float32) * 1e-4).astype(
            jnp.bfloat16
        )
        _np.asarray(jax.device_get(run(q, k, v, scales)))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _np.asarray(jax.device_get(run(q, k, v, scales)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_r, t_3r = once(reps), once(3 * reps)
    return max(t_3r - t_r, 0.0) / (2 * reps)


def main_tpu():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from jax.sharding import Mesh

    from phenaki_tpu.ops.attention import qk_norm_attention
    from phenaki_tpu.parallel.ring_attention import sequence_sharded_attention

    assert jax.default_backend() == "tpu", (
        "run the timing arm on the TPU; use --cpu-compile for the sp=8 note"
    )
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("sp",))
    q, k, v = _inputs(jax.random.PRNGKey(0))

    dt_dense = _time_injit(
        lambda q, k, v: qk_norm_attention(q, k, v), q, k, v
    )
    dt_ring = _time_injit(
        lambda q, k, v: sequence_sharded_attention(
            q, k, v, mesh, axis_name="sp"
        ),
        q,
        k,
        v,
    )
    print(
        json.dumps(
            {
                "metric": "ring_vs_dense_flash_attention_fwd",
                "shape": f"b{B} h{H} n{N} d{D}",
                "dense_flash_ms": round(dt_dense * 1e3, 3),
                "ring_sp1_ms": round(dt_ring * 1e3, 3),
                "ring_overhead_ms": round((dt_ring - dt_dense) * 1e3, 3),
                "ring_overhead_x": round(dt_ring / dt_dense, 3),
            }
        ),
        flush=True,
    )


def main_cpu_compile():
    import jax

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    import functools

    from phenaki_tpu.ops import pallas_attention as pa
    from phenaki_tpu.parallel.ring_attention import (
        ring_flash_qk_attention,
        ring_qk_norm_attention,
    )

    devs = jax.devices()
    assert len(devs) >= 8 and devs[0].platform == "cpu", (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8 "
        "JAX_PLATFORMS=cpu"
    )
    pa._INTERPRET = True  # route the flash path off-TPU
    mesh = Mesh(np.asarray(devs[:8]), ("sp",))
    q, k, v = _inputs(jax.random.PRNGKey(0))
    seq = P(None, None, "sp", None)

    out = {"metric": "ring_sp8_compile_cost", "shape": f"b{B} h{H} n{N} d{D}"}
    for name, ring_fn in (
        ("flash_static_unroll", ring_flash_qk_attention),
        ("xla_fori_loop", ring_qk_norm_attention),
    ):
        fn = shard_map(
            functools.partial(ring_fn, axis_name="sp"),
            mesh=mesh,
            in_specs=(seq, seq, seq),
            out_specs=seq,
            check_vma=False,
        )
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(q, k, v).compile()
        dt = time.perf_counter() - t0
        hlo_bytes = len(
            compiled.as_text().encode()
        )  # optimized program text size
        out[f"{name}_compile_s"] = round(dt, 2)
        out[f"{name}_hlo_kb"] = round(hlo_bytes / 1024, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-compile", action="store_true")
    args = ap.parse_args()
    if args.cpu_compile:
        main_cpu_compile()
    else:
        main_tpu()
