"""Round-3 microbench part 4: the cases部3 got wrong or didn't reach.

Every benched fn depends on `i` in a way that perturbs all elements (part-3's
merge used ``k + (i - i)``, which XLA folds to a loop-invariant and hoists).

Run on the real chip: python tools/microbench_r3d.py
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


def bitonic_sort(k, p):
    """Full bitonic sort (keys+payload) via hand-written stages."""
    B, n = k.shape
    size = 2
    while size <= n:
        # merge runs of `size` (alternating direction handled by the
        # standard bitonic network: compare distance size/2 then halving,
        # with direction from position & size)
        d = size // 2
        first = True
        while d >= 1:
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            partner_up = (idx // (2 * d)) % 2 == 0 if False else None
            k2 = k.reshape(B, -1, 2, d)
            p2 = p.reshape(B, -1, 2, d)
            a, b = k2[:, :, 0], k2[:, :, 1]
            pa, pb = p2[:, :, 0], p2[:, :, 1]
            # ascending iff the pair's block index within `size` is even
            blk = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
            if first and size < n:
                # bitonic build stage: reverse direction of odd blocks
                asc = ((blk * (2 * d)) // size) % 2 == 0
            else:
                asc = ((blk * (2 * d)) // size) % 2 == 0
            sw = jnp.where(asc, a > b, a < b)
            k = jnp.stack([jnp.where(sw, b, a), jnp.where(sw, a, b)],
                          axis=2).reshape(B, -1)
            p = jnp.stack([jnp.where(sw, pb, pa), jnp.where(sw, pa, pb)],
                          axis=2).reshape(B, -1)
            d //= 2
            first = False
        size *= 2
    return k, p


def main():
    print(f"backend={jax.default_backend()}", flush=True)
    key = jax.random.PRNGKey(0)
    B, L = 16, 65536

    # 1. bitonic merge, loop-variant keys (adding i keeps halves sorted)
    h1 = jnp.sort(jax.random.randint(key, (B, L), 0, 1 << 20, jnp.int32), 1)
    h2 = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (B, L), 0,
                                     1 << 20, jnp.int32), 1)
    kk = jnp.concatenate([h1, h2], axis=1)
    pp = jnp.broadcast_to(jnp.arange(2 * L, dtype=jnp.int32), (B, 2 * L))
    def merge(i, k, p):
        mk, mp = bitonic_merge(k + i, p, L)
        return mk + mp
    timed("bitonic-merge 2x64k +1pay (16 rows)", merge, kk, pp,
          elems=B * 2 * L)

    # 2. hand bitonic full sort 64k +1pay vs lax.sort
    x = jax.random.randint(key, (B, L), 0, 1 << 20, jnp.int32)
    def bsort(i, a, p):
        mk, mp = bitonic_sort(a + i, p)
        return mk + mp
    timed("hand-bitonic-sort (16,64k) +1pay", bsort, x, pp[:, :L],
          elems=B * L)

    # 3. assoc scans
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
            last2, (vv + i, pp_ + i, vv, jnp.full_like(pp_, -1)), axis=1)
        return r[0] + r[1] + r[2] + r[3]
    timed("assoc_scan 4-tuple (16,128k)", scan4, v, pos, elems=B * L2)

    def last1(a, b):
        av, ap = a
        bv, bp = b
        b1 = bp >= 0
        return jnp.where(b1, bv, av), jnp.where(b1, bp, ap)
    def scan2(i, vv, pp_):
        r = jax.lax.associative_scan(last1, (vv + i, pp_ + i), axis=1)
        return r[0] + r[1]
    timed("assoc_scan 2-tuple (16,128k)", scan2, v, pos, elems=B * L2)

    # 4. packed table gather (16,64k from 256k)
    T, LQ = 262144, 65536
    tab = jax.random.randint(key, (B, T), 0, 1 << 30, jnp.int32)
    iq = jax.random.randint(key, (B, LQ), 0, T, jnp.int32)
    def tg(i, t, ix):
        return jnp.take_along_axis(t, (ix + i) % T, axis=1)
    timed("table-gather (16,64k from 256k)", tg, tab, iq, elems=B * LQ)

    # 5. dynamic per-row roll
    r8 = jax.random.randint(key, (B, LQ), 0, 4, jnp.int8)
    sh = jax.random.randint(key, (B,), 0, LQ, jnp.int32)
    def roll(i, a, s):
        return jax.vmap(jnp.roll)(a, s + i).astype(jnp.int32)
    timed("dyn-roll (16,64k int8)", roll, r8, sh, elems=B * LQ)

    # 6. window-select eval, loop-variant phase
    NBF, FINE = 2048, 32
    cat = jax.random.randint(key, (B, NBF, 256), 0, 4, jnp.int32)
    phase = jax.random.randint(key, (B, NBF), 0, 128, jnp.int32)
    def winsel(i, c, ph):
        win = jnp.stack([c[:, :, s:s + FINE] for s in range(128)], axis=2)
        oh = ((ph + i) % 128)[:, :, None] == jnp.arange(128)[None, None, :]
        return jnp.einsum('bns,bnst->bnt', oh.astype(jnp.bfloat16),
                          win.astype(jnp.bfloat16)).astype(jnp.int32)
    timed("window-select eval (16,2048 blocks,32)", winsel, cat, phase,
          elems=B * NBF * FINE)


if __name__ == '__main__':
    main()
