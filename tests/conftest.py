"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
`--xla_force_host_platform_device_count=8` fake devices — the JAX-native way
to validate N-way sharding without a real slice (SURVEY.md §4).

Note: this image's sitecustomize registers the 'axon' TPU platform and forces
JAX_PLATFORMS=axon, so the env var alone is not enough — we override the
platform via jax.config after import (before any backend initializes).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compilation cache: repeated test runs skip XLA recompiles.
# Keyed by the HOST's CPU features: XLA:CPU AOT executables bake in the
# compile machine's ISA (avx512 variants etc.) and loading one on a
# different host SIGILL/aborts ("Fatal Python error: Aborted" mid-suite) —
# CI/driver sessions migrate between machines, so a shared dir is unsafe.
import hashlib


def _host_cache_tag() -> str:
    # Key by the flags line AND the model identity lines. Flags alone cover
    # the SIGILL case (real ISA mismatch after a VM migration); the model
    # lines additionally separate hosts whose CPUID flags match but whose
    # XLA:CPU model heuristics (LLVM tuning features) differ. Note the
    # loader's "prefer-no-gather/-scatter not supported" warning is NOT
    # migration evidence: it reproduces on a same-host reload of an entry
    # compiled seconds earlier (tuning pseudo-features are compared against
    # raw host CPUID, which never lists them) and is benign.
    try:
        with open("/proc/cpuinfo") as f:
            keyed = [
                line
                for line in f
                if line.startswith(("flags", "model name", "cpu family", "model"))
            ]
        if keyed:
            return hashlib.sha1("".join(sorted(set(keyed))).encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


jax.config.update(
    "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{_host_cache_tag()}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
