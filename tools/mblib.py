"""Shared microbenchmark harness.

The round-2/early-round-3 harness carried only ``out.ravel()[0]`` between
chained iterations; XLA slice-propagates through elementwise/fusible ops, so
purely elementwise candidates (bitonic merges, window selects, cumsums) were
dead-code-eliminated to a handful of elements and measured as ~free. This
harness forces every element: the carry is a full ``jnp.sum`` of the output,
and the measured delta between a 1-iteration and an N-iteration run cancels
dispatch + download + reduction overhead of all but (N-1) iterations' bodies
(each body still pays one extra reduction pass — report sizes accordingly).
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 8


def timed(name, fn, *args, elems, iters=ITERS):
    """fn(i, *args) -> array; chained via a full-reduction carry."""
    @partial(jax.jit, static_argnames=('n',))
    def loop(n, *a):
        def body(i, carry):
            out = fn(i + carry, *a)
            return (jnp.sum(out.astype(jnp.int32).ravel()) % 2)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    float(np.asarray(loop(1, *args)))
    float(np.asarray(loop(iters, *args)))
    t0 = time.perf_counter(); np.asarray(loop(1, *args))
    t1 = time.perf_counter(); np.asarray(loop(iters, *args))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    print(f"{name:52s} {dt*1e3:9.3f} ms/iter  {dt/elems*1e9:8.3f} ns/elem",
          flush=True)
    return dt
