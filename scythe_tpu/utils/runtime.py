"""Small runtime utilities."""

from __future__ import annotations


def enable_compile_cache(path: str = "/root/.cache/jax") -> None:
    """Enable JAX's persistent compilation cache (first compile through the
    TPU tunnel takes minutes; reruns become near-instant)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
