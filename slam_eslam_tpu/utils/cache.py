"""Persistent XLA compilation cache helper.

Compiles on this class of host are expensive (hundreds of ms for even
tiny executables); every entry point (tests, benchmarks, demos) opts
into the on-disk cache so repeat runs skip compilation entirely.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path=None):
    import jax

    path = path or os.environ.get(
        "SLAM_ESLAM_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
