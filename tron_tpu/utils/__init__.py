from tron_tpu.utils.xfer import to_device, to_host


def enable_compilation_cache(path: str = "/tmp/jax_cache_tron") -> None:
    """Turn on JAX's persistent compilation cache (first compiles through
    the tunneled TPU backend take minutes; cached reloads are instant)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


__all__ = ["to_device", "to_host", "enable_compilation_cache"]
