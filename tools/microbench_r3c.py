"""Round-3 microbench part 3 (trusted harness, see mblib.py).

Re-measures every primitive that decides the gather-free aligner design:
sorts (lax + hand bitonic), merges, scans, gathers, rolls, window-selects.

Run on the real chip: python tools/microbench_r3c.py
"""
import jax
import jax.numpy as jnp
import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vclust_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from mblib import timed


def bitonic_merge(k, p, half):
    """keys (B, 2*half), halves presorted asc; one payload."""
    B = k.shape[0]
    k = jnp.concatenate([k[:, :half], k[:, half:][:, ::-1]], axis=1)
    p = jnp.concatenate([p[:, :half], p[:, half:][:, ::-1]], axis=1)
    d = half
    while d >= 1:
        k2 = k.reshape(B, -1, 2, d)
        p2 = p.reshape(B, -1, 2, d)
        a, b = k2[:, :, 0], k2[:, :, 1]
        pa, pb = p2[:, :, 0], p2[:, :, 1]
        sw = a > b
        k = jnp.stack([jnp.where(sw, b, a), jnp.where(sw, a, b)],
                      axis=2).reshape(B, -1)
        p = jnp.stack([jnp.where(sw, pb, pa), jnp.where(sw, pa, pb)],
                      axis=2).reshape(B, -1)
        d //= 2
    return k, p


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    B, L = 16, 65536

    x = jax.random.randint(key, (B, L), 0, 1 << 20, jnp.int32)
    idx = jax.random.randint(key, (B, L), 0, L, jnp.int32)
    pay = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32), (B, L))

    # Re-baselines with the trusted harness.
    timed("sort (16,64k) 1-op", lambda i, a: jnp.sort(a + i, axis=1),
          x, elems=B * L)
    def s2(i, a, p):
        k, v = jax.lax.sort((a + i, p), num_keys=1)
        return k + v
    timed("sort (16,64k) 2-op", s2, x, pay, elems=B * L)
    def gath(i, a, ix):
        return jnp.take_along_axis(a, (ix + i) % L, axis=1)
    timed("gather (16,64k) random", gath, x, idx, elems=B * L)
    timed("cumsum (16,64k)", lambda i, a: jnp.cumsum(a + i, axis=1),
          x, elems=B * L)
    timed("cummax (16,64k)", lambda i, a: jax.lax.cummax(a + i, axis=1),
          x, elems=B * L)
    def ew(i, a):
        y = a + i
        for _ in range(10):
            y = jnp.where(y > 5, y * 3 + 1, y ^ 7)
        return y
    timed("elementwise x10 (16,64k)", ew, x, elems=B * L * 10)

    # Bitonic merge (elementwise stages), now actually computed.
    h1 = jnp.sort(x, axis=1)
    h2 = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (B, L), 0,
                                     1 << 20, jnp.int32), axis=1)
    kk = jnp.concatenate([h1, h2], axis=1)
    pp = jnp.broadcast_to(jnp.arange(2 * L, dtype=jnp.int32), (B, 2 * L))
    def merge(i, k, p):
        mk, mp = bitonic_merge(k + (i - i), p, L)
        return mk + mp
    timed("bitonic-merge 2x64k +1pay (16 rows)", merge, kk, pp,
          elems=B * 2 * L)

    # lax.sort small rows (per-fine-block vote sorts).
    xs = jax.random.randint(key, (B * 2048, 128), 0, 1 << 20, jnp.int32)
    timed("sort (32768,128) 1-op",
          lambda i, a: jnp.sort(a + i, axis=1), xs, elems=B * 2048 * 128)

    # 1-op big sorts for the block-key join variant.
    for LL in (262144, 524288):
        xb = jax.random.randint(key, (B, LL), 0, 1 << 30, jnp.int32)
        timed(f"sort (16,{LL//1024}k) 1-op",
              lambda i, a: jnp.sort(a + i, axis=1), xb, elems=B * LL)

    # associative_scan, 4-tuple carry (last-2-valid monoid), 128k.
    L2 = 131072
    v = jax.random.randint(key, (B, L2), 0, 1 << 20, jnp.int32)
    pos = jnp.where(jax.random.bernoulli(key, 0.5, (B, L2)),
                    jnp.broadcast_to(jnp.arange(L2, dtype=jnp.int32),
                                     (B, L2)), -1)
    def last2(a, b):
        av1, ap1, av2, ap2 = a
        bv1, bp1, bv2, bp2 = b
        b1 = bp1 >= 0
        b2 = bp2 >= 0
        return (jnp.where(b1, bv1, av1), jnp.where(b1, bp1, ap1),
                jnp.where(b2, bv2, jnp.where(b1, av1, av2)),
                jnp.where(b2, bp2, jnp.where(b1, ap1, ap2)))
    def scan4(i, vv, pp_):
        r = jax.lax.associative_scan(
            last2, (vv + i, pp_, vv, jnp.full_like(pp_, -1)), axis=1)
        return r[0] + r[1] + r[2] + r[3]
    timed("assoc_scan 4-tuple (16,128k)", scan4, v, pos, elems=B * L2)

    # 2-tuple variant (last-1-valid).
    def last1(a, b):
        av, ap = a
        bv, bp = b
        b1 = bp >= 0
        return jnp.where(b1, bv, av), jnp.where(b1, bp, ap)
    def scan2(i, vv, pp_):
        r = jax.lax.associative_scan(last1, (vv + i, pp_), axis=1)
        return r[0] + r[1]
    timed("assoc_scan 2-tuple (16,128k)", scan2, v, pos, elems=B * L2)

    # packed table gather: table (B, 262144) int32, idx (B, 65536).
    T, LQ = 262144, 65536
    tab = jax.random.randint(key, (B, T), 0, 1 << 30, jnp.int32)
    iq = jax.random.randint(key, (B, LQ), 0, T, jnp.int32)
    def tg(i, t, ix):
        return jnp.take_along_axis(t, (ix + i) % T, axis=1)
    timed("table-gather (16,64k from 256k)", tg, tab, iq, elems=B * LQ)

    # dynamic roll by per-row shift.
    r8 = jax.random.randint(key, (B, LQ), 0, 4, jnp.int8)
    sh = jax.random.randint(key, (B,), 0, LQ, jnp.int32)
    def roll(i, a, s):
        return jax.vmap(jnp.roll)(a, s + i).astype(jnp.int32)
    timed("dyn-roll (16,64k int8)", roll, r8, sh, elems=B * LQ)

    # window-select eval: 128 shifted windows + onehot einsum.
    NBF, FINE = 2048, 32
    cat = jax.random.randint(key, (B, NBF, 256), 0, 4, jnp.int32)
    phase = jax.random.randint(key, (B, NBF), 0, 128, jnp.int32)
    def winsel(i, c, ph):
        win = jnp.stack([c[:, :, s:s + FINE] for s in range(128)], axis=2)
        oh = (ph[:, :, None] + i * 0 == jnp.arange(128)[None, None, :])
        return jnp.einsum('bns,bnst->bnt', oh.astype(jnp.bfloat16),
                          win.astype(jnp.bfloat16)).astype(jnp.int32)
    timed("window-select eval (16,2048 blocks,32)", winsel, cat, phase,
          elems=B * NBF * FINE)


if __name__ == '__main__':
    main()
