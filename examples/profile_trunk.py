"""Capture a device trace of the MaskGit trunk fwd+bwd and attribute time.

Used to locate the train-step HBM-traffic tax (nn.scan activation stashes,
copies/reshapes) that caps end-to-end train MFU — the round-3 review's top
item. Captures a jax.profiler trace of the flagship trunk fwd+bwd, then
aggregates per-op self time from the xplane proto by category (fusions,
dynamic-update-slice stashes, copies/transposes, Pallas kernels, convs).

Run (TPU):  python examples/profile_trunk.py [--reps 6] [--keep-trace DIR]
Prints one JSON line per category plus the top-20 ops by self time.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _aggregate_xplane(path: str):
    """Sum device-op self times from an xplane.pb by event name.

    Uses the xplane proto bundled with tensorboard_plugin_profile/xprof.
    Device lines live in planes named '/device:TPU:*'; each event's duration
    is self time at the XLA-op granularity (TPU op events don't nest)."""
    try:
        from xprof.protobuf import xplane_pb2  # xprof >= 2.20
    except ImportError:
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    totals = defaultdict(float)  # name -> total duration ps
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        # sample/step lanes double-count compute; keep XLA op lanes only
        ev_names = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            lname = line.name.lower()
            if "step" in lname or "sample" in lname:
                continue
            for ev in line.events:
                totals[ev_names.get(ev.metadata_id, "?")] += ev.duration_ps
    return totals


def _aggregate_trace_json(path: str):
    """Fallback aggregator over the Chrome-trace .trace.json.gz the profiler
    writes next to the xplane.pb (environments without the xplane proto
    bindings). Device-side lanes carry '/device:TPU' process names (thread
    names like 'XLA Ops'); complete events ('ph' == 'X') give duration in
    microseconds. Self time at XLA-op granularity — TPU op events don't
    nest, matching the xplane path."""
    import gzip

    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])

    # map pid -> process name, (pid, tid) -> thread name from metadata events
    proc = {}
    thread = {}
    for ev in events:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                proc[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("name") == "thread_name":
                thread[(ev.get("pid"), ev.get("tid"))] = ev.get("args", {}).get(
                    "name", ""
                )

    # unlike xplane TPU-op lanes, chrome-trace events NEST (jit_* and while.*
    # parents span their children), so compute SELF time per thread with an
    # interval stack: a child's duration is subtracted from its parent's.
    by_thread = defaultdict(list)
    for ev in events:
        if ev.get("ph") != "X":
            continue
        pname = proc.get(ev.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        tname = thread.get((ev.get("pid"), ev.get("tid")), "").lower()
        if "step" in tname or "sample" in tname or "module" in tname:
            continue  # step/sample/module lanes double-count the op lanes
        by_thread[(ev.get("pid"), ev.get("tid"))].append(
            (
                float(ev.get("ts", 0.0)),
                float(ev.get("dur", 0.0)),
                ev.get("name", "?"),
            )
        )

    totals = defaultdict(float)  # name -> total SELF duration ps
    for evs in by_thread.values():
        evs.sort(key=lambda e: (e[0], -e[1]))
        stack = []  # (end_ts, name, self_dur_us) — mutable via list entries
        def pop_until(ts):
            while stack and stack[-1][0] <= ts + 1e-9:
                end, name, self_us = stack.pop()
                totals[name] += self_us * 1e6  # us -> ps
        for ts, dur, name in evs:
            pop_until(ts)
            if stack:
                stack[-1][2] -= dur  # child time is not parent self time
            stack.append([ts + dur, name, dur])
        pop_until(float("inf"))
    return totals


CATEGORIES = (
    ("pallas_attention", ("flash", "_bwd_dq", "_bwd_dkv", "_bwd_dbias")),
    ("dus_stash", ("dynamic-update-slice", "dynamic_update_slice")),
    ("copy_transpose", ("copy", "transpose")),
    ("convolution", ("convolution", "conv")),
    ("all_reduce", ("all-reduce", "all-gather", "reduce-scatter")),
    ("fusion_other", ("fusion",)),
)


def categorize(name: str) -> str:
    low = name.lower()
    for cat, keys in CATEGORIES:
        if any(k in low for k in keys):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--keep-trace", default=None)
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_bench_cache")

    from phenaki_tpu.models.maskgit import MaskGit
    from phenaki_tpu.utils.jit_init import jit_init

    dtype = jnp.bfloat16
    B, n = 4, 1152
    patch = (9, 16, 8)
    maskgit = MaskGit(
        dim=512, num_tokens=65536, max_seq_len=n, depth=6, heads=8,
        dim_head=64, dim_context=768, scan_layers=True, dtype=dtype,
    )
    rng = jax.random.PRNGKey(0)
    ids = jnp.zeros((1, n), jnp.int32)
    ctx1 = jnp.zeros((1, 128, 768), jnp.float32)
    params = jit_init(maskgit, rng, ids, video_patch_shape=patch, context=ctx1)[
        "params"
    ]
    ids = jax.jit(lambda k: jax.random.randint(k, (B, n), 0, 65536))(
        jax.random.PRNGKey(1)
    )
    ctx = jax.jit(lambda k: jax.random.normal(k, (B, 128, 768), jnp.float32))(
        jax.random.PRNGKey(2)
    )
    cot = jax.jit(lambda k: jax.random.normal(k, (B, n, 512), dtype))(
        jax.random.PRNGKey(3)
    )
    jax.block_until_ready((params, ids, ctx, cot))

    @jax.jit
    def trunk_fwd_bwd(mgp, k):
        def f(p):
            h = maskgit.apply(
                {"params": p}, ids, video_patch_shape=patch, context=ctx,
                return_embeds=True, rngs={"cond_drop": k, "dropout": k},
            )
            return jnp.sum(h.astype(jnp.float32) * cot.astype(jnp.float32))

        return jax.grad(f)(mgp)

    # warm up (compile) outside the trace
    g = trunk_fwd_bwd(params, jax.random.PRNGKey(7))
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(g)[0]))

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="trunk_trace_")
    with jax.profiler.trace(trace_dir):
        outs = [
            trunk_fwd_bwd(params, jax.random.PRNGKey(100 + i))
            for i in range(args.reps)
        ]
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(outs[-1])[0]))

    planes = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    jsons = sorted(
        glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not planes and not jsons:
        print(json.dumps({"error": f"no trace artifacts under {trace_dir}"}))
        return
    try:
        totals = _aggregate_xplane(planes[-1]) if planes else None
    except ImportError:
        totals = None
    if totals is None:
        totals = _aggregate_trace_json(jsons[-1])

    by_cat = defaultdict(float)
    for name, ps in totals.items():
        by_cat[categorize(name)] += ps
    total_ms = sum(by_cat.values()) / 1e9
    print(json.dumps({"trace_dir": trace_dir, "reps": args.reps}))
    for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(
            json.dumps(
                {
                    "category": cat,
                    "ms_per_step": round(ps / 1e9 / args.reps, 3),
                    "pct": round(100 * ps / (total_ms * 1e9), 1),
                }
            )
        )
    top = sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]
    for name, ps in top:
        print(
            json.dumps(
                {"op": name[:120], "ms_per_step": round(ps / 1e9 / args.reps, 3)}
            )
        )


if __name__ == "__main__":
    main()
