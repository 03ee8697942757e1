"""vae_gslm_tpu — TPU-native VAE-GSLM speech framework (JAX/XLA/Pallas).

Enables the persistent XLA compilation cache on import **for real
accelerator platforms only**: compiles in this environment round-trip
through a slow service, and the cache makes warm starts an order of
magnitude faster.  XLA:CPU cache entries are host-specific AOT code
(loading them on a different machine fails with machine-feature
mismatches), so the cache is never enabled when the process is forced
onto the CPU platform.  Disable entirely with
``VAE_GSLM_NO_COMPILE_CACHE=1``.
"""
import os as _os

_force_cpu = bool(_os.environ.get("VAE_GSLM_FORCE_CPU"))

if _force_cpu:
    # The axon TPU plugin in this image ignores JAX_PLATFORMS; the
    # config API is the reliable escape hatch (must precede backend
    # init, hence here).
    import jax as _jax_cpu

    try:
        _jax_cpu.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover
        pass


def _cpu_platform_requested() -> bool:
    """True when this process will run on XLA:CPU (whose persistent
    cache entries are host-specific and must not be shared)."""
    if _force_cpu:
        return True
    if "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        return True
    if "xla_force_host_platform_device_count" in _os.environ.get(
            "XLA_FLAGS", ""):
        return True
    return False


if (not _os.environ.get("VAE_GSLM_NO_COMPILE_CACHE")
        and not _cpu_platform_requested()):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "VAE_GSLM_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # Only cache programs worth caching: tiny entries churn the
        # directory into thousands of files (an operational hazard)
        # while saving nothing.
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except Exception:  # pragma: no cover - older jax fallbacks
        pass
