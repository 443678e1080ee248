"""Persistent XLA/Mosaic compilation cache.

The reference backends' runtimes cache compiled kernels too (OpenCV caches
OpenCL programs on disk; CUDA.jl caches PTX per session), so enabling JAX's
persistent compilation cache is the same library behavior — it shrinks the
"once" column to cache-hit cost on warm runs while first-ever runs still
show true compile cost, exactly like the reference backends.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/dip_tpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as e:  # pragma: no cover - older jax without the flag
        # Say so: a silently-disabled cache changes what the 'once'
        # column measures (full compile instead of cache hit).
        import sys
        print(f"NOTE: persistent compile cache unavailable ({e})",
              file=sys.stderr)
        return
    for flag, val in (("jax_persistent_cache_min_compile_time_secs", 0.0),
                      ("jax_persistent_cache_min_entry_size_bytes", 0)):
        try:
            jax.config.update(flag, val)
        except Exception:  # pragma: no cover - tuning-only knobs
            pass  # cache itself is enabled; defaults just cache less
