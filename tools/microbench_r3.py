"""Round-3 primitive microbenchmarks, measured INSIDE fused/vmapped jit
programs (round-2 numbers were per-op and may include dispatch overhead).

Timing protocol per axon quirks (see memory): chain ITERS dependent
iterations inside one jitted fori_loop, force a device->host download of a
scalar, subtract the 1-iteration run to cancel dispatch+download latency.

Run on the real chip:  python tools/microbench_r3.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vclust_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

B, L = 16, 65536
ITERS = 32


def timed(name, fn, *args, elems, iters=ITERS):
    """fn(i, *args) -> array; chained via carry xor."""
    @partial(jax.jit, static_argnames=('n',))
    def loop(n, *a):
        def body(i, carry):
            out = fn(i + carry, *a)
            return (out.ravel()[0] % 2).astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    # warm up both variants (compile), then force download
    float(np.asarray(loop(1, *args)))
    float(np.asarray(loop(iters, *args)))
    t0 = time.perf_counter()
    r1 = loop(1, *args); _ = np.asarray(r1)
    t1 = time.perf_counter()
    r2 = loop(iters, *args); _ = np.asarray(r2)
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    print(f"{name:46s} {dt*1e3:9.3f} ms/iter  {dt/elems*1e9:8.3f} ns/elem")
    return dt


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    x32 = jax.random.randint(key, (B, L), 0, 1 << 20, dtype=jnp.int32)
    idx = jax.random.randint(key, (B, L), 0, L, dtype=jnp.int32)
    pay = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))

    # 1. vmapped row sort (single operand)
    timed("sort (16,64k) 1-op", lambda i, a: jnp.sort(a + i, axis=1),
          x32, elems=B * L)
    # 2. lax.sort 2-operand
    def sort2(i, a, p):
        k, v = jax.lax.sort((a + i, p), num_keys=1)
        return k + v
    timed("sort (16,64k) 2-op", sort2, x32, pay, elems=B * L)
    # 3. random gather per row
    def gath(i, a, ix):
        return jnp.take_along_axis(a, (ix + i) % L, axis=1)
    timed("gather (16,64k) random", gath, x32, idx, elems=B * L)
    # 4. cumsum
    timed("cumsum (16,64k)", lambda i, a: jnp.cumsum(a + i, axis=1),
          x32, elems=B * L)
    # 5. cummax
    timed("cummax (16,64k)", lambda i, a: jax.lax.cummax(a + i, axis=1),
          x32, elems=B * L)
    # 6. fused elementwise chain x10
    def ew(i, a):
        y = a + i
        for _ in range(10):
            y = jnp.where(y > 5, y * 3 + 1, y ^ 7)
        return y
    timed("elementwise x10 (16,64k)", ew, x32, elems=B * L * 10)
    # 7. gather of 32-blocks via lax.gather slice_sizes
    starts = jax.random.randint(key, (B, L // 32), 0, L - 32, jnp.int32)
    def blk(i, a, st):
        def one(row, s):
            dn = jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,))
            return jax.lax.gather(
                row, ((s + i) % (L - 32))[:, None], dn, (32,),
                mode=jax.lax.GatherScatterMode.CLIP)
        return jax.vmap(one)(a, st)
    timed("block-gather 32-wide (16,2048 blocks)", blk, x32, starts,
          elems=B * L)
    # 8. argsort vs sort-with-iota payload
    timed("argsort (16,64k)",
          lambda i, a: jnp.argsort(a + i, axis=1).astype(jnp.int32),
          x32, elems=B * L)
    # 9. bf16 matmul 2048^3
    a16 = jax.random.normal(key, (2048, 2048), jnp.bfloat16)
    def mm(i, a):
        return (a + i.astype(jnp.bfloat16)) @ a
    timed("bf16 matmul 2048^3", mm, a16, elems=2 * 2048**3)  # ns/flop
    # 10. int8 matmul -> int32
    a8 = jax.random.randint(key, (2048, 2048), -127, 127, jnp.int8)
    def mm8(i, a):
        return jax.lax.dot(a, a, preferred_element_type=jnp.int32)
    timed("int8 matmul 2048^3", mm8, a8, elems=2 * 2048**3)
    # 11. small-row sorts: (512, 4096)
    xs = jax.random.randint(key, (512, 4096), 0, 1 << 20, jnp.int32)
    timed("sort (512,4k) 1-op", lambda i, a: jnp.sort(a + i, axis=1),
          xs, elems=512 * 4096)
    # 12. gather small rows (512,4096)
    ixs = jax.random.randint(key, (512, 4096), 0, 4096, jnp.int32)
    def gsm(i, a, ix):
        return jnp.take_along_axis(a, (ix + i) % 4096, axis=1)
    timed("gather (512,4k) random", gsm, xs, ixs, elems=512 * 4096)
    # 13. one-hot matmul gather: values (L,) gathered at (N,) via onehot
    #     int8 @ int8: is it competitive? table 4096, 4096 lookups x 16
    tab = jax.random.randint(key, (B, 4096), 0, 127, jnp.int8)
    iq = jax.random.randint(key, (B, 4096), 0, 4096, jnp.int32)
    def oh(i, t, ix):
        onehot = ((ix[:, :, None] + i) % 4096 ==
                  jnp.arange(4096)[None, None, :]).astype(jnp.int8)
        return jax.lax.dot_general(
            onehot, t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)
    timed("onehot-matmul gather (16,4k from 4k)", oh, tab, iq,
          elems=B * 4096)
    # 14. reduce-window / conv-style windowed sum (AW_WIN=15 window)
    def win(i, a):
        return jax.lax.reduce_window((a + i), 0, jax.lax.add,
                                     (1, 15), (1, 1), 'SAME')
    timed("reduce_window 15 (16,64k)", win, x32, elems=B * L)


if __name__ == '__main__':
    main()
