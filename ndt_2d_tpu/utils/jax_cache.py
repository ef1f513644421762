"""Persistent XLA compilation cache.

TPU compilation of the fused match step is expensive (minutes through a
remote-compile service); the computation graphs are static per config, so a
persistent on-disk cache makes every session after the first start in
milliseconds.  The reference has no analog (C++ is ahead-of-time compiled);
this is the TPU-native equivalent of shipping a compiled binary.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX at a persistent compilation cache directory (idempotent).

    Respects ``NDT2D_XLA_CACHE`` (set to ``0``/``off`` to disable, or to a
    directory path to relocate).
    """
    global _enabled
    env = os.environ.get("NDT2D_XLA_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return ""
    if cache_dir is None:
        cache_dir = env or os.path.join(
            os.path.expanduser("~"), ".cache", "ndt_2d_tpu", "xla")
    if _enabled:
        return cache_dir
    import jax
    try:
        backend = jax.default_backend()
    except Exception:  # backend init failed; don't make it worse
        return ""
    if backend == "cpu":
        # CPU compiles are fast and the XLA:CPU AOT loader spams feature-
        # mismatch warnings on reload; the cache only pays off on TPU.
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every compilation regardless of compile time / size.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
    return cache_dir
