"""JAX runtime configuration helpers."""

import os

_DEFAULT_CACHE = os.path.join(os.path.expanduser("~"), ".cache", "tpusnark_jax")


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: limb-arithmetic graphs are expensive
    to compile (minutes); caching makes it one-time per (shape, code) across
    processes. Safe to call multiple times."""
    import jax

    path = path or os.environ.get("TPUSNARK_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
