"""Round-5 microbench: the row-gather direct-table join vs the sort join.

Round 4 measured ELEMENT gathers (take_along_axis, 7-10 ns/elem) and
concluded gathers lose to sort-joins. This bench measures the untested
variant: a **row gather + where-tree lane select** from a per-genome
direct-addressed table. SEED_K=8 makes the seed-value space exactly
65536, so a (65536/w, w)-shaped packed table holds the last-2 reference
occurrences of EVERY value; the join is then
    row = value >> log2(w); lanes = table[row]; tree-select lane (value & (w-1))
with no sort and no restore (candidates come back in query order).
Row gathers are the primitive _window_rows already uses (~free per
round-3/4 profiles); the open question is achieved bandwidth at random
row indices and small row widths. Cases:

1. row-gather+tree join at widths 8/16/32/64 (int32) and 16/32 (int64);
2. the round-4 sort join (sort1+sort2) as the baseline at same shapes;
3. election small-row sorts (K*NBF, 64) and (K*NBC, 256);
4. cummax over (KB, Lq) vs a hierarchical scan (intra-32 log shifts +
   32x-shorter block cummax + broadcast fixup);
5. int32 scatter-max table BUILD cost (65536 slots per genome-strand).

Run on the real chip: python tools/microbench_r5.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vclust_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from mblib import timed

B = 16            # dispatch rows (kept small: the gather output is fat)
Lq = Lr = 65536
K = 8
C = 16
NQ = (Lq // 32) * C     # 32768 sampled query seeds per query
W = Lr // 32 * C + K * NQ

rng = np.random.default_rng(0)


def tree_select(rows, lane, w):
    """rows (..., w) -> (...,) picking rows[..., lane] by binary where-tree."""
    out = rows
    bit = w >> 1
    while bit:
        hw = out.shape[-1] - bit
        out = jnp.where((lane & bit > 0)[..., None], out[..., bit:],
                        out[..., :hw])
        bit >>= 1
    return out[..., 0]


def main():
    qv = jnp.asarray(rng.integers(0, 65536, (B, K * NQ)).astype(np.int32))

    for w in (8, 16, 32, 64):
        tab = jnp.asarray(
            rng.integers(0, 1 << 30, (B, 65536 // w, w)).astype(np.int32))

        def jg(i, t, q, w=w):
            qi = (q + i.astype(jnp.int32)) & 0xFFFF
            rows = jax.vmap(lambda tb, qb: tb[qb >> int(np.log2(w))])(t, qi)
            return tree_select(rows, qi & (w - 1), w)
        timed(f'row-gather+tree join w={w:3d} int32', jg, tab, qv,
              elems=B * K * NQ)

    for w in (16, 32):
        tab = jnp.asarray(
            rng.integers(0, 1 << 40, (B, 65536 // w, w)).astype(np.int64))

        def jg64(i, t, q, w=w):
            qi = (q + i.astype(jnp.int32)) & 0xFFFF
            rows = jax.vmap(lambda tb, qb: tb[qb >> int(np.log2(w))])(t, qi)
            return tree_select(rows, qi & (w - 1), w)
        timed(f'row-gather+tree join w={w:3d} int64', jg64, tab, qv,
              elems=B * K * NQ)

    # sort-join baseline at the same B (per-element cost is what matters)
    keys = jnp.asarray(rng.integers(0, 1 << 17, (B, W)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))
    p3 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))

    def sort4(i, k, a, b, c):
        out = jax.lax.sort((k + i.astype(jnp.int32), a, b, c), num_keys=1,
                           dimension=1)
        return out[1]
    timed('join sort1 baseline: 4xint32 (B,W)', sort4, keys, p1, p2, p3,
          elems=B * W)

    # election small-row sorts
    NBF = Lq // 32
    NBC = Lq // 128
    sd_f = jnp.asarray(
        rng.integers(0, 1 << 17, (K * NBF, 64)).astype(np.int32))

    def esort(i, a):
        return jnp.sort(a + i.astype(jnp.int32), axis=-1)
    timed('election sort fine (K*NBF, 64)', esort, sd_f,
          elems=K * NBF * 64)
    sd_c = jnp.asarray(
        rng.integers(0, 1 << 17, (K * NBC, 256)).astype(np.int32))
    timed('election sort coarse (K*NBC, 256)', esort, sd_c,
          elems=K * NBC * 256)

    # scans: lax.cummax vs hierarchical
    KB = 64
    x = jnp.asarray(rng.integers(-1, 1 << 20, (KB, Lq)).astype(np.int32))

    def cmax(i, a):
        return jax.lax.cummax(a + i.astype(jnp.int32), axis=1)
    timed('lax.cummax (64, Lq) int32', cmax, x, elems=KB * Lq)

    def hmax(i, a):
        a = a + i.astype(jnp.int32)
        blk = a.reshape(KB, Lq // 32, 32)
        intra = blk
        for s in (1, 2, 4, 8, 16):
            pad = jnp.full((KB, Lq // 32, s), -(1 << 30), jnp.int32)
            intra = jnp.maximum(
                intra, jnp.concatenate([pad, intra[..., :-s]], axis=-1))
        carry = jax.lax.cummax(blk.max(axis=-1), axis=1)
        cpad = jnp.full((KB, 1), -(1 << 30), jnp.int32)
        carry = jnp.concatenate([cpad, carry[:, :-1]], axis=1)
        return jnp.maximum(intra, carry[..., None]).reshape(KB, Lq)
    timed('hierarchical cummax 32-blocked', hmax, x, elems=KB * Lq)

    def hmax128(i, a):
        a = a + i.astype(jnp.int32)
        FB = 128
        blk = a.reshape(KB, Lq // FB, FB)
        intra = blk
        s = 1
        while s < FB:
            pad = jnp.full((KB, Lq // FB, s), -(1 << 30), jnp.int32)
            intra = jnp.maximum(
                intra, jnp.concatenate([pad, intra[..., :-s]], axis=-1))
            s *= 2
        carry = jax.lax.cummax(blk.max(axis=-1), axis=1)
        cpad = jnp.full((KB, 1), -(1 << 30), jnp.int32)
        carry = jnp.concatenate([cpad, carry[:, :-1]], axis=1)
        return jnp.maximum(intra, carry[..., None]).reshape(KB, Lq)
    timed('hierarchical cummax 128-blocked', hmax128, x, elems=KB * Lq)

    # table build: scatter-max of Lr positions into 65536 slots, G genomes
    G = 16
    vals = jnp.asarray(rng.integers(0, 65536, (G, Lr)).astype(np.int32))

    def build(i, v):
        v = (v + i.astype(jnp.int32)) & 0xFFFF
        pos = jnp.broadcast_to(jnp.arange(Lr, dtype=jnp.int32)[None], v.shape)
        t = jnp.zeros((G, 65536), jnp.int32)
        return t.at[jnp.arange(G)[:, None], v].max(pos + 1)
    timed('table build scatter-max (G=16, Lr) -> (G, 65536)', build, vals,
          elems=G * Lr)


if __name__ == '__main__':
    main()
