"""vae_gslm_tpu — TPU-native VAE-GSLM speech framework (JAX/XLA/Pallas).

Enables the persistent XLA compilation cache on import: compiles in
this environment round-trip through a slow service, and the cache makes
warm starts an order of magnitude faster.  Disable with
``VAE_GSLM_NO_COMPILE_CACHE=1``.
"""
import os as _os

if _os.environ.get("VAE_GSLM_FORCE_CPU"):
    # The axon TPU plugin in this image ignores JAX_PLATFORMS; the
    # config API is the reliable escape hatch (must precede backend
    # init, hence here).
    import jax as _jax_cpu

    try:
        _jax_cpu.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover
        pass

if not _os.environ.get("VAE_GSLM_NO_COMPILE_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "VAE_GSLM_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                           -1)
    except Exception:  # pragma: no cover - older jax fallbacks
        pass
