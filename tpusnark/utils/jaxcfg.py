"""JAX runtime configuration helpers."""

import os
import platform


def _cache_dir() -> str:
    """Per-machine cache path. XLA:CPU persists AOT results specialized to the
    host's CPU features; an entry written on one box SIGILLs (or slow-fails
    with cpu_aot_loader errors) on another. Key the directory by platform +
    processor so a repo checked out on a new machine starts a fresh cache."""
    tag = f"{platform.system()}-{platform.machine()}-{platform.node()}".lower()
    return os.path.join(os.path.expanduser("~"), ".cache", f"tpusnark_jax-{tag}")


def enable_compilation_cache(path: str | None = None):
    """Persistent XLA compilation cache: limb-arithmetic graphs are expensive
    to compile (minutes); caching makes it one-time per (shape, code) across
    processes. Safe to call multiple times."""
    import jax

    path = path or os.environ.get("TPUSNARK_JAX_CACHE", _cache_dir())
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
