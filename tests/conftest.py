"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: in this environment the axon TPU plugin ignores the
``JAX_PLATFORMS`` env var; the platform must be forced via
``jax.config`` after import (before backend init).

The persistent compile cache makes warm test runs much faster, but
XLA:CPU cache entries are host-specific AOT code — loading an entry
compiled on a different machine fails with machine-feature-mismatch
errors (this broke the round-2 driver gate).  The cache directory is
therefore keyed by a fingerprint of this host's CPU, so entries from
another machine can never be picked up.
"""
import hashlib
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("VAE_GSLM_FORCE_CPU", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def _host_fingerprint() -> str:
    """Key the cache dir by everything LLVM's feature detection can
    depend on: the flags line alone is NOT enough — XLA:CPU sets
    scheduling features like +prefer-no-gather per CPU *model*
    (microarchitecture errata), so two hosts with identical cpuinfo
    flags can still produce mutually unloadable AOT entries."""
    keys = ("vendor_id", "cpu family", "model", "model name",
            "stepping", "microcode", "flags")
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not line.strip():
                    break          # first processor block only
                if line.split(":")[0].strip() in keys:
                    parts.append(line.strip())
    except OSError:
        import platform

        parts = [platform.processor()]
    # cpuinfo alone proved insufficient (round 3): two VMs with
    # byte-identical cpuinfo produced AOT entries differing in XLA's
    # derived tuning features (+prefer-no-gather/-scatter), so the
    # machine identity and the jaxlib build are mixed in as well —
    # entries are only ever reused on the exact machine+toolchain that
    # wrote them.
    try:
        with open("/etc/machine-id") as f:
            parts.append(f.read().strip())
    except OSError:
        pass
    import jaxlib

    parts.append(jaxlib.__version__)
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:12]


if not os.environ.get("VAE_GSLM_NO_COMPILE_CACHE"):
    _cache_dir = f"/root/repo/.jax_cache_cpu_{_host_fingerprint()}"
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Subprocess tests (CLI scripts, multihost ranks) cold-compiled
    # every run — the suite's dominant cost once the main process is
    # cache-warm.  jax reads these env vars natively at import, and
    # the fingerprinted dir already guarantees same-host entries, so
    # exporting them extends the cache to every child process.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1.0"
