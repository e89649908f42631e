"""Persistent XLA compile cache — first compiles of the T=100 scan through
the remote TPU compile service take minutes; the cache makes every CLI
invocation after the first fast."""

import os


def enable_compile_cache(path: str = "/tmp/jax_cache") -> None:
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
