"""Persistent XLA compilation cache.

The align/prefilter device programs are large (unrolled shift windows,
multiple length-bucket variants) and first-compile on TPU runs to minutes;
the persistent cache makes every later process pay only milliseconds.
Disable with VCLUST_JAX_CACHE=0; override the location with
VCLUST_JAX_CACHE=<dir>.
"""

import os

_DONE = False


def enable_compilation_cache() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    flag = os.environ.get('VCLUST_JAX_CACHE', '')
    if flag == '0':
        return
    cache_dir = flag or os.path.join(
        os.path.expanduser('~'), '.cache', 'vclust_tpu', 'jax')
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:   # pragma: no cover - cache is best-effort
        pass
