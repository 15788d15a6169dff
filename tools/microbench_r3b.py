"""Round-3 microbench part 2: exact-shape costs for the aligner redesign.

- short-row sorts (the election's per-block vote sorts)
- multi-payload unsort sorts
- XLA bitonic merge of two presorted halves (elementwise stages only)
- Pallas block-diagonal eval kernel (ref in VMEM, pl.ds slices per block)
- sort-based eval (sort rj + ffill + unsort) as the pure-XLA alternative
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

ITERS = 32


def timed(name, fn, *args, elems, iters=ITERS):
    @partial(jax.jit, static_argnames=('n',))
    def loop(n, *a):
        def body(i, carry):
            out = fn(i + carry, *a)
            return (out.ravel()[0] % 2).astype(jnp.int32)
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))
    float(np.asarray(loop(1, *args)))
    float(np.asarray(loop(iters, *args)))
    t0 = time.perf_counter(); np.asarray(loop(1, *args))
    t1 = time.perf_counter(); np.asarray(loop(iters, *args))
    t2 = time.perf_counter()
    dt = ((t2 - t1) - (t1 - t0)) / (iters - 1)
    print(f"{name:46s} {dt*1e3:9.3f} ms/iter  {dt/elems*1e9:8.3f} ns/elem",
          flush=True)
    return dt


def bitonic_merge(keys, pay, L):
    """Merge: keys (B, 2L) where [:, :L] and [:, L:] are each sorted asc.
    Returns fully sorted (keys, pay). Elementwise stages only."""
    B = keys.shape[0]
    # reverse second half -> bitonic sequence
    k = jnp.concatenate([keys[:, :L], keys[:, :L*2][:, ::-1][:, :L]], axis=1)
    p = jnp.concatenate([pay[:, :L], pay[:, :L*2][:, ::-1][:, :L]], axis=1)
    d = L
    while d >= 1:
        k2 = k.reshape(B, -1, 2, d)
        p2 = p.reshape(B, -1, 2, d)
        a, b = k2[:, :, 0], k2[:, :, 1]
        pa, pb = p2[:, :, 0], p2[:, :, 1]
        sw = a > b
        lo = jnp.where(sw, b, a); hi = jnp.where(sw, a, b)
        plo = jnp.where(sw, pb, pa); phi = jnp.where(sw, pa, pb)
        k = jnp.stack([lo, hi], axis=2).reshape(B, -1)
        p = jnp.stack([plo, phi], axis=2).reshape(B, -1)
        d //= 2
    return k, p


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)

    # 1. election-shaped sorts
    for shape in [(2048, 128), (512, 512), (16384, 128), (4096, 512)]:
        x = jax.random.randint(key, shape, 0, 1 << 20, jnp.int32)
        timed(f"sort {shape} 1-op",
              lambda i, a: jnp.sort(a + i, axis=1), x,
              elems=shape[0] * shape[1])

    # 2. unsort: 1 key + 4 payloads at (16, 64k)
    B, L = 16, 65536
    x = jax.random.randint(key, (B, L), 0, 1 << 20, jnp.int32)
    pays = [jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))] * 4
    def sort5(i, a, *ps):
        outs = jax.lax.sort((a + i,) + ps, num_keys=1)
        r = outs[0]
        for o in outs[1:]:
            r = r + o
        return r
    timed("sort (16,64k) 1key+4pay", sort5, x, *pays, elems=B * L)

    # 3. bitonic merge of two sorted 64k halves + 1 payload
    h1 = jnp.sort(jax.random.randint(key, (B, L), 0, 1 << 20, jnp.int32), 1)
    h2 = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (B, L), 0,
                                     1 << 20, jnp.int32), 1)
    kk = jnp.concatenate([h1, h2], axis=1)
    pp = jnp.broadcast_to(jnp.arange(2 * L, dtype=jnp.int32), (B, 2 * L))
    def merge(i, k, p):
        mk, mp = bitonic_merge(k + (i - i), p, L)
        return mk + mp
    timed("bitonic-merge 2x64k +1pay (16 rows)", merge, kk, pp,
          elems=B * 2 * L)

    # 4. Pallas block-diagonal eval: q (B, L) int8, r (B, L) int8,
    #    D (B, NB) int32 -> match flags (B, L) int8
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    FINE = 128
    NB = L // FINE

    def eval_kernel(d_ref, q_ref, r_ref, out_ref):
        def body(b, _):
            d = d_ref[0, b]
            start = jnp.clip(b * FINE + d, 0, L - FINE)
            rblk = r_ref[0, pl.ds(start, FINE)]
            qblk = q_ref[0, pl.ds(b * FINE, FINE)]
            out_ref[0, pl.ds(b * FINE, FINE)] = (
                (qblk == rblk)).astype(jnp.int8)
            return 0
        jax.lax.fori_loop(0, NB, body, 0)

    qc = jax.random.randint(key, (B, L), 0, 4, jnp.int8)
    rc = jax.random.randint(key, (B, L), 0, 4, jnp.int8)
    Dm = jax.random.randint(key, (B, NB), -100, 100, jnp.int32)

    def pallas_eval(i, q, r, D):
        return pl.pallas_call(
            eval_kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, NB), lambda b: (b, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, L), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, L), lambda b: (b, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, L), lambda b: (b, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L), jnp.int8),
        )((D + i - i), q, r).astype(jnp.int32)
    try:
        timed("pallas eval FINE=128 (16,64k)", pallas_eval, qc, rc, Dm,
              elems=B * L)
    except Exception as e:
        print("pallas eval failed:", repr(e), flush=True)

    # 5. sort-based eval: rj=iota+D (per FINE=32), sort rj, ffill join
    #    against natural order, unsort
    FINE2 = 32
    D2 = jax.random.randint(key, (B, L // FINE2), -100, 100, jnp.int32)
    r32 = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    q32 = jax.random.randint(key, (B, L), 0, 4, jnp.int32)
    iota = jnp.arange(L, dtype=jnp.int32)
    def sort_eval(i, q, r, D):
        rj = jnp.clip(iota[None] + jnp.repeat(D + (i - i), FINE2, axis=1),
                      0, L - 1)
        # sort by rj carrying i
        srj, si = jax.lax.sort((rj, jnp.broadcast_to(iota[None], (B, L))),
                               num_keys=1)
        # values of r at sorted rj: since srj sorted and r dense in pos,
        # r[srj] = propagate r along... here must still gather; emulate the
        # merge approach: keys = 2*pos for r entries, 2*rj+1 for queries
        keys = jnp.concatenate([2 * jnp.broadcast_to(iota[None], (B, L)),
                                2 * srj + 1], axis=1)
        vals = jnp.concatenate([r, jnp.zeros_like(r)], axis=1)
        pays = jnp.concatenate([jnp.full((B, L), -1, jnp.int32), si], 1)
        sk, sv, sp = jax.lax.sort((keys, vals, pays), num_keys=1)
        rv = jax.lax.cummax(jnp.where(sp < 0, sv, -1), axis=1)
        # compact query slots back: sort by payload
        key2 = jnp.where(sp >= 0, sp, (1 << 30))
        _, rvq = jax.lax.sort((key2, rv), num_keys=1)
        rvq = rvq[:, :L]
        return (rvq == q).astype(jnp.int32)
    timed("sort-eval FINE=32 (16,64k)", sort_eval, q32, r32, D2,
          elems=B * L)


if __name__ == '__main__':
    main()
