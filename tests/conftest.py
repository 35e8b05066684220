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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in _flags:
    # Cap XLA:CPU codegen at AVX2 so persistently-cached AOT executables
    # are PORTABLE across fleet hosts. These VMs LIVE-migrate (observed:
    # same boot_id, identical /proc/cpuinfo, yet a previously-green cache
    # entry abort()s mid-suite on the new physical host) — no host
    # fingerprint can key that, so make the code host-independent instead.
    # Tests are compile-bound, not compute-bound; the AVX512/AMX loss is
    # noise here.
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# persistent compilation cache: repeated test runs skip XLA recompiles.
# Keyed by the HOST's CPU features as a belt (XLA:CPU AOT executables bake
# in the compile machine's ISA and loading one elsewhere can abort
# mid-suite), with the AVX2 ISA cap above as the suspenders — a LIVE
# migration preserves every host fingerprint (boot_id, cpuinfo) while
# changing the physical CPU, so portability of the generated code is the
# only robust defense. The cap also changes the cache key, retiring
# entries compiled before it.
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
