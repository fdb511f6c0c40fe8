"""Persistent XLA compilation cache.

The renderer's solver loops compile into large HLO programs; caching
compiled executables across processes makes benches/CLIs start in seconds
after the first run.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax
    path = path or os.environ.get(
        'ARAH_JAX_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), '.jax_cache'))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
        # 0.0: persist EVERY executable — on the axon remote compiler even
        # sub-0.5 s compiles cost a multi-second round trip per process
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
    except Exception as e:  # older jax versions
        print(f'compilation cache unavailable: {e}')
