"""Round-4 microbench: candidate replacements for the sort join.

Shapes mirror the full-genome bucket (Lq=Lr=65536, K=8, B=25) that
dominates BENCH's tpu_align_pairs_per_s. Cases:

1. the current join sort1 (4-array int32 sort of W) and sort2 (3-array);
2. int64 cummax over (B, W);
3. table-gather join: per-row gather of K*Ls candidates from a per-row
   65536-entry value table (the hash-join alternative);
4. shared-table gather: all rows gather from ONE table (VMEM-resident?);
5. hand-written bitonic MERGE of two pre-sorted halves (key+1 payload);
6. the _eval_on-shaped where-tree select: (rows, 256) -> (rows, 32) with
   16x8 tree, on K*Lq elements;
7. segmentation scan chain (8 cummax over (K, Lq) int32).

Run on the real chip: python tools/microbench_r4.py
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

B = 25
Lq = Lr = 65536
K = 8
Ls = Lq // 2
W = Lr + K * Ls          # 327680

rng = np.random.default_rng(0)


def main():
    keys = jnp.asarray(rng.integers(0, 1 << 17, (B, W)).astype(np.int32))
    p1 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))
    p2 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))
    p3 = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))

    def sort4(i, k, a, b, c):
        out = jax.lax.sort((k + i.astype(jnp.int32), a, b, c), num_keys=1,
                           dimension=1)
        return out[1]
    timed('join sort1: 4xint32 (B,W)', sort4, keys, p1, p2, p3,
          elems=B * W)

    def sort2(i, k, a, b):
        out = jax.lax.sort((k + i.astype(jnp.int32), a, b), num_keys=1,
                           dimension=1)
        return out[1]
    timed('join sort2: 3xint32 (B,W)', sort2, keys, p1, p2, elems=B * W)

    k64 = jnp.asarray(rng.integers(0, 1 << 56, (B, W)).astype(np.int64))

    def sort_k64(i, k, a):
        out = jax.lax.sort((k + i.astype(jnp.int64), a), num_keys=1,
                           dimension=1)
        return out[1]
    timed('join sort: int64 key + 1xint64 payload', sort_k64, k64,
          k64, elems=B * W)

    def cmax(i, a):
        return jax.lax.cummax(a + i.astype(jnp.int64), axis=1)
    timed('cummax int64 (B,W)', cmax, k64, elems=B * W)

    # --- table-gather join -------------------------------------------------
    NQ = K * Ls
    tables = jnp.asarray(
        rng.integers(0, 1 << 62, (B, 65536)).astype(np.int64))
    qv = jnp.asarray(rng.integers(0, 65536, (B, NQ)).astype(np.int32))

    def tgather(i, t, q):
        qi = (q + i.astype(jnp.int32)) & 0xFFFF
        return jnp.take_along_axis(t, qi.astype(jnp.int32), axis=1)
    timed('per-row table gather (B, K*Ls) from (B, 65536)', tgather,
          tables, qv, elems=B * NQ)

    table1 = tables[0]

    def tgather1(i, t, q):
        qi = (q + i.astype(jnp.int32)) & 0xFFFF
        return t[qi]
    timed('shared table gather (B, K*Ls) from (65536,)', tgather1,
          table1, qv, elems=B * NQ)

    # one-hot matmul lookup: table as (65536,) f32, queries one-hot via
    # 256x256 two-level trick is complex; measure plain segment-sum scatter
    def scat(i, q):
        t = jnp.zeros((B, 65536), jnp.int32)
        val = (q + i.astype(jnp.int32))
        return t.at[jnp.arange(B)[:, None], (val & 0xFFFF)].set(val)
    timed('per-row table SCATTER (B, 65536) <- K*Ls', scat, qv,
          elems=B * NQ)

    # --- bitonic merge of two sorted halves -------------------------------
    h1 = np.sort(rng.integers(0, 1 << 17, (B, W // 2)).astype(np.int32), 1)
    h2 = np.sort(rng.integers(0, 1 << 17, (B, W // 2)).astype(np.int32), 1)
    cat = jnp.asarray(np.concatenate([h1, h2[:, ::-1]], axis=1))
    pay = jnp.asarray(rng.integers(0, 1 << 30, (B, W)).astype(np.int32))

    def bmerge(i, k, p):
        k = k + i.astype(jnp.int32)
        d = W // 2
        while d >= 1:
            k2 = k.reshape(B, -1, 2, d)
            p2 = p.reshape(B, -1, 2, d)
            a, b = k2[:, :, 0], k2[:, :, 1]
            pa, pb = p2[:, :, 0], p2[:, :, 1]
            sw = a > b
            k = jnp.stack([jnp.where(sw, b, a), jnp.where(sw, a, b)],
                          axis=2).reshape(B, W)
            p = jnp.stack([jnp.where(sw, pb, pa), jnp.where(sw, pa, pb)],
                          axis=2).reshape(B, W)
            d //= 2
        return k + p
    timed('bitonic merge key+payload int32 (B,W)', bmerge, cat, pay,
          elems=B * W)

    # --- eval where-tree ---------------------------------------------------
    FINE = 32
    rows = K * (Lq // FINE)
    cat256 = jnp.asarray(rng.integers(0, 5, (B, rows, 256)).astype(np.int8))
    ph = jnp.asarray(rng.integers(0, 128, (B, rows)).astype(np.int32))

    def wtree(i, cat, phase):
        phase = (phase + i.astype(jnp.int32)) & 127
        ph3 = phase >> 3
        ph0 = phase & 7
        sel = jnp.zeros(cat.shape[:-1] + (FINE + 8,), cat.dtype)
        for s in range(16):
            sel = jnp.where((ph3 == s)[..., None],
                            cat[..., 8 * s:8 * s + FINE + 8], sel)
        out = jnp.zeros(cat.shape[:-1] + (FINE,), cat.dtype)
        for s in range(8):
            out = jnp.where((ph0 == s)[..., None], sel[..., s:s + FINE], out)
        return out
    timed('eval where-tree 16x8 (B, K*NBF, 256->32)', wtree, cat256, ph,
          elems=B * K * Lq)

    def wtree_bin(i, cat, phase):
        phase = (phase + i.astype(jnp.int32)) & 127
        width = 256
        need = FINE
        out = cat
        for bit in (64, 32, 16, 8, 4, 2, 1):
            width = max(need, width - bit)
            hi = out[..., bit:bit + width]
            lo = out[..., :width]
            out = jnp.where((phase & bit > 0)[..., None], hi, lo)
        return out[..., :FINE]
    timed('eval where-tree binary 7-step', wtree_bin, cat256, ph,
          elems=B * K * Lq)

    # --- segmentation scans ------------------------------------------------
    m = jnp.asarray(rng.integers(0, 2, (B, K, Lq)).astype(np.int32))

    def segscan(i, m):
        x = m + i.astype(jnp.int32)
        for _ in range(8):
            x = jax.lax.cummax(x, axis=2)
            x = x + 1
        return x
    timed('8x cummax int32 (B,K,Lq)', segscan, m, elems=B * K * Lq * 8)

    # elementwise chain like sections 5-6 (shift/or/and ~40 deep)
    def chain(i, m):
        x = (m + i.astype(jnp.int32)) > 0
        for _ in range(40):
            y = jnp.concatenate(
                [jnp.zeros(x.shape[:-1] + (1,), x.dtype), x[..., :-1]],
                axis=-1)
            x = x ^ y
        return x
    timed('40-deep shift/xor chain (B,K,Lq)', chain, m,
          elems=B * K * Lq * 40)


if __name__ == '__main__':
    main()
