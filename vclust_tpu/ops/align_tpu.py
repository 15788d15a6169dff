"""TPU-native batched aligner: the `engine='tpu'` align path.

A from-scratch, massively parallel reformulation of the LZ-ANI alignment
stage (reference contract vclust.py:1058-1181; measure semantics
SURVEY.md section 2.5.3), designed for the TPU's matrix and vector units
rather than a translation of the sequential greedy parse. Two front ends
share one back half; both compile one program per length bucket and run
hundreds of directed pairs per dispatch with no data-dependent control
flow:

- **v3 (default, VCLUST_ALIGN_PIPE=v3)** — the round-5 MXU pipeline:
  canonical-8-mer occupancy matmul for coarse candidate regions (top-2
  per 128-wide query block), banded base-level eval via fused
  shift-compare-accumulate for exact per-32-block diagonal election,
  neighbor propagation and match flags read straight out of the band
  arrays. Design rationale and constants at the "v3 front end" section
  below.
- **v2 (VCLUST_ALIGN_PIPE=v2, and buckets beyond V3_MAX_BUCKET)** — the
  round-4 sort-join pipeline: stratified seed sampling (C per 32-block,
  keyed on value so both join sides stay consistent), K-query
  reference-amortized sort join with last-2-occurrence cummax, two-scale
  sorted-vote diagonal election, eval via overlapped window rows, and a
  two-phase sparse-screen/full-density rerun (all2all_tpu docstring).

The shared back half (_blocks_to_measures) turns per-block elected
(strand, diagonal) assignments plus per-position match flags into the
lz-ani measure aggregates: single-switch boundary refinement, region
breaks, anchored-match chaining (msl/mal runs, aw/am density windows as
bit-dilation chains), segmentation via hierarchical cummax scans, and —
with keep_alignments — per-segment records in the --out-alignment
contract.

Primitive costs that shaped both designs, measured on v5e
(tools/microbench_r4.py, tools/microbench_r5.py): `lax.sort` ~1.9-2.8
ns/element regardless of payload count; gathers ~6.7 ns per ROW at any
row width; scatters ~4.7-14 ns/element; `lax.cummax` ~0.116 ns/element
(hierarchical log-shift scans: below measurement noise); elementwise
chains and MXU matmuls effectively free by comparison. Every
content-addressed lookup therefore costs O(ns) — the v2 sort join and
its election sorts floor at ~450 us per directed 64 kb pair — while the
MXU path moves candidate generation to the one unit with headroom.

Semantics vs the exact engines (`native`/`py`, which are bit-identical
to each other): same measures up to block-granularity approximations of
anchor choice and approximate-extension boundaries. Accuracy is pinned
by tests/test_align_tpu.py: tANI within the reference's own accuracy
contract (±0.007 of simulated ground truth, reference test.py:456-477)
and within a small tolerance of the exact engine on every golden pair.
Use `tpu` for throughput at scale; use `native` for golden-parity
per-alignment output.
"""

import contextlib
from functools import lru_cache, partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _x64(pack_bits: int):
    """JAX truncates jnp.int64 to int32 silently unless x64 is enabled —
    which would corrupt the wide seed pack for genomes > 64 kb (the join
    returns zero candidates). Trace the pack_bits=64 programs under the
    scoped x64 context; 32-bit buckets stay on the default config."""
    if pack_bits == 64:
        return jax.enable_x64(True)
    return contextlib.nullcontext()

from .lz_parse_py import AlignParams
from ..utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import os as _os_tune


def _env_num(name, default, lo, hi, cast=int):
    """Tuning-knob parser with validation: malformed or out-of-range
    values raise a clear error at import instead of corrupting the join
    downstream (e.g. SEEDK > 8 would silently overflow the uint32
    value<<16 seed pack — seed values need 2k <= 16 bits)."""
    raw = _os_tune.environ.get(name)
    if raw is None:
        return default
    try:
        v = cast(raw)
    except ValueError:
        raise ValueError(f'{name}={raw!r} is not a valid {cast.__name__}')
    if not (lo <= v <= hi):
        raise ValueError(f'{name}={v} out of range [{lo}, {hi}]')
    return v


SEED_K = _env_num('VCLUST_ALIGN_SEEDK', 8, 4, 8)
#                     seed length for diagonal votes (TPU path); 8 keeps
#                     (value, position) packs inside one uint32 for
#                     buckets up to 65536 (larger buckets pack in int64)
SEEDS_PER_BLOCK = _env_num('VCLUST_ALIGN_C', 16, 1, 32)
#                     stratified seed sampling: per 32-position fine
#                     block, keep the C seeds with the smallest value
#                     hash, on BOTH join sides. Selection keyed on the
#                     k-mer VALUE keeps query/reference consistent (a
#                     matching seed survives on both sides together, the
#                     minimizer argument), so the expected matched-vote
#                     yield is C/FINE of all matches with zero padding
#                     waste — the join width (the measured cost driver:
#                     lax.sort ~2.8 ns/element regardless of payload
#                     count, tools/microbench_r4.py) shrinks to 1/4 on
#                     both sides.
CANDS = 2           # candidate reference positions kept per seed (the
#                     newest two occurrences; the block election makes
#                     repeat resolution robust to the small candidate set)
K_QUERIES = 8       # queries sharing one reference per dispatch row (the
#                     reference side of the join is amortized K ways)
BLOCK = 128         # coarse block width = diagonal election granularity
FINE = 32           # fine block width (rearrangement-boundary resolution)
GAP_DIAG = 16       # max diagonal spread within one vote cluster
SMAX = 15           # cluster-count saturation (ranking needs no more)
MIN_VOTES_F = _env_num('VCLUST_ALIGN_MVF', 2, 1, 64)
#                     votes needed for a fine block to elect a diagonal
MIN_VOTES_C = _env_num('VCLUST_ALIGN_MVC', 3, 1, 256)
#                     votes needed for a coarse block to elect a diagonal
#                     (scaled with the 1/4 stratified sampling rate: the
#                     expected matched votes per block are C/FINE of all
#                     matching positions)
EXT_ITERS = _env_num('VCLUST_ALIGN_EXTI', 3, 0, 16)
#                     neighbor-diagonal propagation passes (the raster
#                     analog of factor extension across block boundaries:
#                     a block may adopt an adjacent block's diagonal when
#                     it out-matches its own election)
EXT_MIN = _env_num('VCLUST_ALIGN_EXTMIN', 17, 1, 32)
#                     matches (of FINE) a propagated diagonal must reach —
#                     the approximate-extension density bound (>= 53%,
#                     aw/am: <= 7 mismatches per 15) at block granularity
EXT_MARGIN = _env_num('VCLUST_ALIGN_EXTMARGIN', 4, 0, 32)
#                     propagated diagonal must beat an elected one by this
MSL = 7             # consecutive matches forming a seed run (chains)
MAL = 11            # consecutive matches able to OPEN a region
AW = 39             # max distance from a seed run for a match to chain
AW_WIN = 15         # approximate-extension window length (density rule)
AM = 7              # max mismatches tolerated inside the window

BIG = np.int32(2 ** 30)

# Longest genome the TPU engine indexes: the int64 seed pack gives the
# position fields 20 bits (pos+1 <= 0xFFFFF), so buckets beyond 2**20 would
# silently corrupt the join. models/align.py routes longer genomes' pairs
# to the exact native engine.
MAX_TPU_LEN = 1 << 20

_BUCKETS = sorted({4096 << i for i in range(8)}
                  | {6144 << i for i in range(8)})


def _pad_bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // 131072) * 131072


def kmer_vals(codes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Packed k-mer value at every position (int32); -1 where the window
    contains a non-ACGT code or runs past the end."""
    L = codes.shape[0]
    c = codes.astype(jnp.int32)
    vals = jnp.zeros(L, jnp.int32)
    bad = jnp.zeros(L, jnp.bool_)
    for j in range(k):
        cj = jnp.roll(c, -j)
        cj = jnp.where(jnp.arange(L) + j < L, cj, 4)
        bad = bad | (cj >= 4)
        vals = (vals << 2) | jnp.where(bad, 0, jnp.where(cj >= 4, 0, cj))
    return jnp.where(bad, -1, vals)


# --------------------------------------------------------------------------
# elementwise helpers (static shifts / dilations along the last axis)
# --------------------------------------------------------------------------

def _sh_r(x, k, fill):
    """x shifted right by k along the last axis (out[i] = x[i-k])."""
    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def _sh_l(x, k, fill):
    if k == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (k,), fill, x.dtype)
    return jnp.concatenate([x[..., k:], pad], axis=-1)


def _dilate_back(x, n):
    """OR of x shifted right by 0..n (bool): any true in [i-n, i]."""
    y = x
    p = 1
    while p * 2 <= n + 1:
        y = y | _sh_r(y, p, False)
        p *= 2
    if p <= n:
        y = y | _sh_r(y, n + 1 - p, False)
    return y


def _dilate_fwd(x, n):
    y = x
    p = 1
    while p * 2 <= n + 1:
        y = y | _sh_l(y, p, False)
        p *= 2
    if p <= n:
        y = y | _sh_l(y, n + 1 - p, False)
    return y


def _run_positions(m, run_len):
    """Positions inside a run of >= run_len consecutive matches."""
    start = m
    for j in range(1, run_len):
        start = start & _sh_l(m, j, False)
    return _dilate_back(start, run_len - 1)


def _win_sum(m_i32, n):
    """Trailing-window sum over the last n positions: out[i] =
    sum(m[i-n+1 .. i]). Built from log-decomposed shifted partial sums."""
    sums = {1: m_i32}
    p = 1
    while p * 2 <= n:
        sums[p * 2] = sums[p] + _sh_r(sums[p], p, jnp.int32(0))
        p *= 2
    out = None
    off = 0
    while n:
        q = 1 << (n.bit_length() - 1)
        part = _sh_r(sums[q], off, jnp.int32(0))
        out = part if out is None else out + part
        off += q
        n -= q
    return out


def _hcummax(x, reverse=False):
    """Exact cummax along the last axis via a 128-blocked hierarchical
    scan: intra-block log-shift maxes (elementwise, fuses to ~free) plus a
    128x-shorter `lax.cummax` over block carries. Measured on v5e
    (tools/microbench_r5.py): `lax.cummax` costs ~0.116 ns/elem — ~61 us
    per directed pair across the 8 segmentation scans at the 64 kb bucket
    — while this decomposition is below measurement noise. Falls back to
    `lax.cummax` when the axis is short or not a multiple of 128."""
    L = x.shape[-1]
    FB = 128
    if L < 2 * FB or L % FB:
        return jax.lax.cummax(x, axis=x.ndim - 1, reverse=reverse)
    if reverse:
        return _hcummax(x[..., ::-1])[..., ::-1]
    ident = (jnp.iinfo(x.dtype).min
             if jnp.issubdtype(x.dtype, jnp.signedinteger) else x.dtype.type(0))
    blk = x.reshape(x.shape[:-1] + (L // FB, FB))
    intra = blk
    s = 1
    while s < FB:
        pad = jnp.full(intra.shape[:-1] + (s,), ident, x.dtype)
        intra = jnp.maximum(
            intra, jnp.concatenate([pad, intra[..., :-s]], axis=-1))
        s *= 2
    carry = jax.lax.cummax(blk.max(axis=-1), axis=blk.ndim - 2)
    cpad = jnp.full(carry.shape[:-1] + (1,), ident, x.dtype)
    carry = jnp.concatenate([cpad, carry[..., :-1]], axis=-1)
    return jnp.maximum(intra, carry[..., None]).reshape(x.shape)


def _ffill_idx(flag, iota):
    """Index of the most recent True at or before each position (-1 if
    none), along the last axis."""
    x = jnp.where(flag, iota, -1)
    return _hcummax(x)


def _rev_next_idx(flag, iota, none_val):
    """Smallest index >= i with flag (none_val if none)."""
    x = jnp.where(flag, -iota, -BIG)
    neg = _hcummax(x, reverse=True)
    return jnp.where(neg > -BIG, -neg, none_val)


# --------------------------------------------------------------------------
# the per-row core: 1 reference x K queries
# --------------------------------------------------------------------------

def _strand_votes(sv, pk1, pk2, key_q, qslot, *, NR, NQ, K, Lq, C, offset,
                  pack_bits):
    """Candidate diagonals for all K queries against one reference strand.

    sv: (NR,) value-sorted sampled reference seed values (BIG where
    invalid); pk1/pk2: packed (value, pos) / (value, prev-pos) arrays
    aligned to sv; key_q: (K*NQ,) prebuilt query sort keys
    (value<<6 | in-block-offset<<1 | 1; odd sentinel where invalid —
    every query slot must stay a query slot so the post-sort [:K*NQ]
    compaction slice aligns); qslot: (K*NQ,) flat query slot ids.
    Returns (K, NQ, 2) int32 diagonal codes (BIG where invalid), offset
    added for the strand.
    """
    bigkey = jnp.int32(2 ** 30)     # even → parses as a non-query slot
    key_ref = jnp.where(sv < BIG, sv << 6, bigkey)
    keys = jnp.concatenate([key_ref, key_q])
    if pack_bits == 32:
        zq = jnp.zeros(K * NQ, jnp.uint32)
        pay1 = jnp.concatenate([pk1, zq])
        pay2 = jnp.concatenate([pk2, zq])
        pay3 = jnp.concatenate([jnp.full(NR, BIG, jnp.int32), qslot])
        sk, s1, s2, s3 = jax.lax.sort((keys, pay1, pay2, pay3), num_keys=1)
        c1 = _hcummax(s1)
        c2 = _hcummax(s2)
        val = (sk >> 6)
        is_q = (sk & 1) == 1
        qpos = ((s3 % NQ) // C) * FINE + ((sk >> 1) & 31)

        def cand(c):
            # Positions pack as pos+1 so 0 stays the no-candidate sentinel
            # even for k-mer value 0 at reference position 0 (valid seeds
            # end >= k before the bucket edge, so pos+1 < 2**16 always).
            cv = (c >> 16).astype(jnp.int32)
            cp = (c & 0xFFFF).astype(jnp.int32) - 1
            ok = is_q & (cv == val) & (c > 0)
            d = cp - qpos + Lq + offset
            return jnp.where(ok, d, BIG)

        d1, d2 = cand(c1), cand(c2)
    else:
        zq = jnp.zeros(K * NQ, jnp.int64)
        pay = jnp.concatenate([pk1, zq])    # pk1 is the int64 triple pack
        pay3 = jnp.concatenate([jnp.full(NR, BIG, jnp.int32), qslot])
        sk, s1, s3 = jax.lax.sort((keys, pay, pay3), num_keys=1)
        c = _hcummax(s1)
        val = (sk >> 6)
        is_q = (sk & 1) == 1
        qpos = ((s3 % NQ) // C) * FINE + ((sk >> 1) & 31)
        cv = (c >> 40).astype(jnp.int32)
        cp = ((c >> 20) & 0xFFFFF).astype(jnp.int32)
        cq = (c & 0xFFFFF).astype(jnp.int32)
        ok = is_q & (cv == val) & (c > 0)
        d1 = jnp.where(ok, cp - 1 - qpos + Lq + offset, BIG)
        d2 = jnp.where(ok & (cq > 0), cq - 1 - qpos + Lq + offset, BIG)
    k2 = jnp.where(is_q, s3, BIG)
    _, v1, v2 = jax.lax.sort((k2, d1, d2), num_keys=1)
    return jnp.stack([v1[:K * NQ], v2[:K * NQ]], axis=-1).reshape(K, NQ, 2)


def _elect(sd, cstride, min_votes, *, DSPAN, Lq):
    """Densest-cluster election on per-block sorted votes sd (rows, vpb).

    Counting "votes within GAP_DIAG above mine" uses static shifted
    compares on the sorted row; counts saturate at SMAX per counted
    element, so the coarse scale counts a cstride-subsample of the sorted
    row to keep large clusters distinguishable at the same cost. The
    cluster representative is carried by max-packing (no argmax gathers).
    Returns (assigned, strand, diag, vb_exact, medv) per row.
    """
    sds = sd[:, ::cstride]
    w = sds.shape[1]
    smax = min(SMAX, w - 1)
    pad = jnp.full(sds.shape[:-1] + (smax,), BIG, jnp.int32)
    sdp = jnp.concatenate([sds, pad], axis=-1)
    cnt = jnp.ones(sds.shape, jnp.int32)
    cnt_eq = jnp.ones(sds.shape, jnp.int32)
    for s in range(1, smax + 1):
        cnt = cnt + (sdp[:, s:w + s] - sds <= GAP_DIAG)
        cnt_eq = cnt_eq + (sdp[:, s:w + s] == sds)
    cnt = jnp.where(sds < BIG, cnt, 0)
    cnt_eq = jnp.where(sds < BIG, cnt_eq, 0)
    # Max-pack (count, inverted value): the winner is the largest cluster,
    # ties broken toward the smallest start value (matches argmax-first).
    # Vote codes reach ~2*(Lq+Lr)+64; for bucket pairs where that exceeds
    # the 22-bit field the pack widens to int64 (counts <= 256 need 9 bits,
    # so 22+9 is the int32 ceiling) instead of silently clamping codes.
    max_code = 2 * DSPAN + 64
    if max_code < (1 << 22):
        VBITS, pdt = 22, jnp.int32
    else:
        VBITS, pdt = 32, jnp.int64
    VMASK = (1 << VBITS) - 1
    clamped = jnp.minimum(sds, VMASK).astype(pdt)
    packed = (cnt.astype(pdt) << VBITS) | (VMASK - clamped)
    best = jnp.max(packed, axis=-1)
    vb = (best >> VBITS).astype(jnp.int32)
    start = (VMASK - (best & VMASK)).astype(jnp.int32)
    # Cluster representative: the MODE of the cluster window — the match
    # evaluation needs the diagonal exactly, and the most frequent exact
    # value is robust to spurious votes inside the window (a range
    # midpoint or mean would drift off-diagonal and zero the block).
    inb = (sds >= start[:, None]) & (sds <= start[:, None] + GAP_DIAG)
    packed_m = jnp.where(inb, (cnt_eq.astype(pdt) << VBITS)
                         | (VMASK - clamped), -1)
    bestm = jnp.max(packed_m, axis=-1)
    medv = jnp.where(vb > 0, (VMASK - (bestm & VMASK)).astype(jnp.int32),
                     BIG)
    # Exact (unsaturated) vote count of the elected cluster.
    vb_x = jnp.sum((jnp.abs(sd - medv[:, None]) <= GAP_DIAG)
                   .astype(jnp.int32), axis=-1)
    vb_x = jnp.where(medv < BIG, vb_x, 0)
    strand = medv >= DSPAN
    diag = jnp.where(strand, medv - DSPAN, medv) - Lq
    return vb_x >= min_votes, strand, diag, vb_x, medv


def _window_rows(r2dov, starts, strand, NRT):
    """Reference bases on the elected diagonals, one 64-wide overlapped
    row per fine block: full-lane row gather + 5-step binary where-tree
    phase select (the 32-spacing/64-wide layout moves 4x fewer bytes per
    eval pass than the round-3 128/256 layout — the eval stage is
    HBM-bound, tools/profile_align.py). starts: (rows,) window starts
    clipped to [-FINE, Lr-1] (row 0 per strand is an all-pad lead row, so
    slightly-negative windows read pad bases that can never match);
    NRT = rows per strand."""
    row = (starts + FINE) >> 5             # in [0, NRT)
    phase = starts + FINE - (row << 5)     # in [0, 32)
    row = row + jnp.where(strand, NRT, 0)
    out = r2dov[row]                        # (rows, 64) int8 row gather
    for bit in (16, 8, 4, 2, 1):
        w = out.shape[-1] - bit
        out = jnp.where((phase & bit > 0)[..., None], out[..., bit:],
                        out[..., :w])
    return out[..., :FINE]


def _eval_on(q_fwd, r2dov, D, S, okb, rlen, qlens, *, K, Lq, Lr, NBF, NRT):
    """Per-position match flags of each query against the reference bases
    on its fine block's elected diagonal."""
    iota = jnp.arange(Lq, dtype=jnp.int32)
    b0 = jnp.arange(NBF, dtype=jnp.int32) * FINE
    starts = b0[None, :] + D                       # (K, NBF) window starts
    starts_c = jnp.clip(starts, -FINE, Lr - 1)
    rb = _window_rows(r2dov, starts_c.reshape(-1), S.reshape(-1), NRT)
    rb = rb.reshape(K, Lq)
    Dq = jnp.repeat(D, FINE, axis=-1)
    # Blocks clipped by more than the pad row are fully out of range; their
    # positions are masked by the true-rj bounds below anyway.
    okq = jnp.repeat(okb & (starts == starts_c), FINE, axis=-1)
    rj = iota[None, :] + Dq
    ok = okq & (rj >= 0) & (rj < rlen) & (iota[None, :] < qlens[:, None])
    return ok & (q_fwd == rb) & (q_fwd < 4)


import os as _os
_ABLATE = _os.environ.get('VCLUST_ALIGN_ABLATE', '')   # stage profiling


def _blocks_to_measures(m1, m0, switchable, A, S, D, Ap, Sp, Dp, rlen,
                        *, K, Lq, mqd, mrd, reg, with_alns=False,
                        debug=False, debug_extra=None):
    """Shared back half of the per-row core: single-switch refinement of
    the per-position flags, region breaks, anchored-match chaining,
    segmentation and aggregates (and per-segment records with with_alns).
    Consumed by both the v2 (sort-join) and v3 (MXU occupancy-matmul)
    front ends: inputs are per-fine-block elected (A, S, D) plus the
    winner flags m1 and previous-block-diagonal flags m0."""
    NBF = Lq // FINE
    iota = jnp.arange(Lq, dtype=jnp.int32)
    # --- 3. per-position match flags with single-switch refinement ------
    m0b = m0.reshape(K * NBF, FINE).astype(jnp.int32)
    m1b = m1.reshape(K * NBF, FINE).astype(jnp.int32)
    g = jnp.cumsum(m0b - m1b, axis=-1)
    gpad = jnp.concatenate(
        [jnp.zeros((K * NBF, 1), jnp.int32), g], axis=-1)
    # Max-pack argmax: first position of the maximum prefix gain (offset
    # keeps the packed gain non-negative so the bit-OR stays monotone).
    tpack = ((gpad + FINE) << 8) | (255 - jnp.arange(FINE + 1,
                                                     dtype=jnp.int32))
    tstar = 255 - (jnp.max(tpack, axis=-1) & 255)
    tstar = jnp.where(switchable.reshape(-1), tstar, 0)
    posb = jnp.arange(FINE, dtype=jnp.int32)[None, :]
    mb = jnp.where(posb < tstar[:, None], m0b, m1b)
    m = mb.reshape(K, Lq).astype(jnp.bool_)
    if _ABLATE == 'eval':
        s = jnp.sum(m.astype(jnp.int32), axis=-1)
        return jnp.stack([s, s, s], axis=-1)

    # --- 4. region breaks ------------------------------------------------
    # Unlinked adjacent assigned blocks break at the switch point (the
    # factor-linking limits: same strand, |diagonal jump| <= mrd).
    linked = A & Ap & (S == Sp) & (jnp.abs(D - Dp) <= mrd)
    first_blk = jnp.concatenate(
        [jnp.ones((K, 1), jnp.bool_), jnp.zeros((K, NBF - 1), jnp.bool_)],
        axis=-1)
    brk_blk = (A & Ap & ~linked & ~first_blk).reshape(-1)
    Bb = brk_blk[:, None] & (posb == jnp.minimum(tstar, FINE - 1)[:, None])
    Bbrk = Bb.reshape(K, Lq)

    # --- 5. anchored matches (bit-dilation chains, no scans) -------------
    # The greedy parse only opens/continues factors at exact seed matches
    # (>= msl consecutive matching bases); scattered single matches are
    # credited only when near a factor (gap credit / approx extension).
    # Raster analog: a match may delimit a segment only when within AW of
    # a >= MSL consecutive-match run; other matches still count toward
    # nt_match inside the segment but cannot extend or chain it.
    in_run = _run_positions(m, MSL)
    in_anchor = _run_positions(m, MAL)   # long enough to OPEN a region
    near_run = _dilate_back(in_run, AW) | _dilate_fwd(in_run, AW)
    # Density pass: the approximate-extension window rule (<= AM
    # mismatches per AW_WIN positions) as a raster predicate — a match
    # chains only if some AW_WIN-window covering it is dense enough.
    # Random 25%-identity terrain fails this almost everywhere.
    w15 = _win_sum(m.astype(jnp.int32), AW_WIN)
    dense_end = w15 >= (AW_WIN - AM)
    covered_by_dense = _dilate_fwd(dense_end, AW_WIN - 1)
    ma = m & near_run & (covered_by_dense | in_run)

    # --- 6. segmentation + aggregates (8 scans, no gathers) --------------
    pm_excl = _sh_r(_ffill_idx(ma, iota[None, :]), 1, jnp.int32(-1))
    any_prev = _dilate_back(_sh_r(ma, 1, False), mqd)  # ma in [i-mqd-1,i-1]
    lastB = _ffill_idx(Bbrk, iota[None, :])
    crossed = (lastB >= 0) & (lastB > pm_excl)
    seg_start = ma & (~any_prev | crossed)
    lastS = _ffill_idx(seg_start, iota[None, :])
    ns_after = _rev_next_idx(_sh_l(seg_start, 1, False), iota[None, :],
                             Lq)              # next start strictly after i
    nma_strict = _rev_next_idx(_sh_l(ma, 1, False), iota[None, :], BIG)
    # Both "next" indices live in the same left-shifted frame, so they
    # compare directly: i is its segment's last anchored match iff the
    # next anchored match does not precede the next segment start.
    e_flag = ma & (nma_strict >= ns_after)
    lastAnchor = _ffill_idx(in_anchor, iota[None, :])
    accept_e = e_flag & (iota[None, :] - lastS + 1 >= reg) & \
        (lastAnchor >= lastS)
    rv = _hcummax(
        jnp.where(e_flag, (Lq - 1 - iota[None, :]) * 2
                  + accept_e.astype(jnp.int32), -1),
        reverse=True)
    accE = (rv & 1) == 1
    lastE_excl = _sh_r(_ffill_idx(e_flag, iota[None, :]), 1, jnp.int32(-2))
    covered = (lastS >= 0) & (lastS > lastE_excl) & (rv >= 0)
    acc_cov = covered & accE
    n_alns = jnp.sum((seg_start & acc_cov).astype(jnp.int32), axis=-1)
    sum_match = jnp.sum((m & acc_cov).astype(jnp.int32), axis=-1)
    sum_alnlen = jnp.sum(acc_cov.astype(jnp.int32), axis=-1)
    if debug:
        return dict(m=m, ma=ma, acc_cov=acc_cov, A=A, S=S, D=D,
                    seg_start=seg_start, e_flag=e_flag,
                    n_alns=n_alns, sum_match=sum_match,
                    sum_alnlen=sum_alnlen, **(debug_extra or {}))
    agg = jnp.stack([n_alns, sum_match, sum_alnlen], axis=-1)  # (K, 3)
    if not with_alns:
        return agg

    # --- 7. per-segment records (the lz-ani --out-alignment contract,
    # reference vclust.py:1127-1133): each accepted segment has exactly
    # one accepted e_flag; compact those positions with one sort, then
    # decode (qstart, qend, rstart, rend, nt_match, nt_mismatch) from a
    # handful of per-record gathers. Off the aggregate hot path (compiled
    # only when alignment rows are requested).
    macc = (m & acc_cov).astype(jnp.int32)
    cm = jnp.cumsum(macc, axis=-1)                 # inclusive prefix
    cm_excl = cm - macc
    # Per-position effective diagonal/strand (switch-point refined).
    tq = jnp.repeat(jnp.minimum(tstar.reshape(K, NBF), FINE), FINE,
                    axis=-1)
    in_pre = (iota[None, :] % FINE) < tq
    Drep = jnp.repeat(D, FINE, axis=-1)
    Dprep = jnp.repeat(Dp, FINE, axis=-1)
    Srep = jnp.repeat(S, FINE, axis=-1)
    Sprep = jnp.repeat(Sp, FINE, axis=-1)
    D_eff = jnp.where(in_pre, Dprep, Drep)
    S_eff = jnp.where(in_pre, Sprep, Srep)
    rec = e_flag & acc_cov
    key = jnp.where(rec, iota[None, :], BIG)
    p_start = jnp.where(rec, lastS, -1)
    k_s, r_end, r_start = jax.lax.sort(
        (key, jnp.broadcast_to(iota[None, :], key.shape), p_start),
        num_keys=1, dimension=1)
    MAXSEG = min(Lq // max(reg, 16) + 8, 2048)
    r_end = jnp.where(k_s[:, :MAXSEG] < BIG, r_end[:, :MAXSEG], -1)
    r_start = jnp.where(r_end >= 0, r_start[:, :MAXSEG], -1)
    g = lambda a, idx: jnp.take_along_axis(a, jnp.maximum(idx, 0), axis=1)
    nt = g(cm, r_end) - g(cm_excl, r_start)
    d_s = g(D_eff, r_start)
    d_e = g(D_eff, r_end)
    strand = g(S_eff, r_start)
    rj_s = r_start + d_s
    rj_e = r_end + d_e
    rstart = jnp.where(strand, rlen - 1 - rj_s, rj_s)
    rend = jnp.where(strand, rlen - 1 - rj_e, rj_e)
    alnlen = r_end - r_start + 1
    recs = jnp.stack(
        [r_start, r_end, rstart, rend, nt, alnlen - nt], axis=-1)
    recs = jnp.where((r_start >= 0)[..., None], recs, -1)
    return agg, recs                               # (K, 3), (K, MAXSEG, 6)


def _row_core(sv_f, pk1_f, pk2_f, sv_r, pk1_r, pk2_r, r2dov, rlen,
              q_fwd, qsv, qoff, qlens, *, Lq, Lr, K, mqd, mrd, reg,
              pack_bits, C=None, with_alns=False, debug=False):
    """Aggregates (n_alns, sum_match, sum_alnlen) for K directed pairs
    sharing one reference."""
    C = SEEDS_PER_BLOCK if C is None else C
    NQ = (Lq // FINE) * C
    NR = (Lr // FINE) * C
    DSPAN = Lq + Lr + 64
    NBF = Lq // FINE
    NBC = Lq // BLOCK
    RATIO = BLOCK // FINE
    NRT = Lr // FINE + 1           # window rows per strand (incl. lead pad)
    iota = jnp.arange(Lq, dtype=jnp.int32)

    # --- 1. seed votes: reference-amortized sort join -------------------
    # Sampled query seeds beyond qlen see pad bases (code 4) and are
    # already invalid (qsv = -1) from the index-time selection.
    bigkey = jnp.int32(2 ** 30)
    key_q = jnp.where(qsv >= 0, (qsv << 6) | (qoff << 1) | 1,
                      bigkey + 1).reshape(-1)
    qslot = jnp.arange(K * NQ, dtype=jnp.int32)
    sv_args = dict(NR=NR, NQ=NQ, K=K, Lq=Lq, C=C,
                   pack_bits=pack_bits)
    votes = jnp.concatenate(
        [_strand_votes(sv_f, pk1_f, pk2_f, key_q, qslot, offset=0,
                       **sv_args),
         _strand_votes(sv_r, pk1_r, pk2_r, key_q, qslot, offset=DSPAN,
                       **sv_args)], axis=-1)       # (K, NQ, 4)
    if _ABLATE == 'join':
        s = jnp.sum(jnp.where(votes < BIG, 1, 0), axis=(1, 2))
        return jnp.stack([s, s, s], axis=-1)

    # --- 2. two-scale block diagonal election ---------------------------
    vpb_f = C * 2 * CANDS
    sd_f = jnp.sort(votes.reshape(K * NBF, vpb_f), axis=-1)
    A_f, S_f, D_f, vb_f, _ = _elect(sd_f, 1, MIN_VOTES_F, DSPAN=DSPAN,
                                    Lq=Lq)
    sd_c = jnp.sort(votes.reshape(K * NBC, vpb_f * RATIO), axis=-1)
    A_c, S_c, D_c, vb_c, medv_c = _elect(sd_c, 4, MIN_VOTES_C, DSPAN=DSPAN,
                                         Lq=Lq)
    # Fine override needs to strictly beat the fine-block vote support for
    # the coarse diagonal; otherwise repeats (which support two clusters
    # equally) would be resolved against the surrounding context.
    center = jnp.repeat(medv_c.reshape(K, NBC), RATIO, axis=-1).reshape(-1)
    sup_c = jnp.sum((jnp.abs(sd_f - center[:, None]) <= GAP_DIAG)
                    .astype(jnp.int32), axis=-1)
    A_cf = jnp.repeat(A_c.reshape(K, NBC), RATIO, axis=-1).reshape(-1)
    use_f = A_f & (~A_cf | (vb_f > sup_c))
    rep = lambda x: jnp.repeat(x.reshape(K, NBC), RATIO, axis=-1)
    A = (use_f | A_cf).reshape(K, NBF)
    S = jnp.where(use_f.reshape(K, NBF), S_f.reshape(K, NBF), rep(S_c))
    D = jnp.where(use_f.reshape(K, NBF), D_f.reshape(K, NBF), rep(D_c))
    vb = jnp.where(use_f.reshape(K, NBF), vb_f.reshape(K, NBF), rep(vb_c))
    if _ABLATE == 'elect':
        s = jnp.sum(jnp.where(A, D, 0), axis=-1) + jnp.sum(vb, axis=-1)
        return jnp.stack([s, s, s], axis=-1)

    # --- 2b. neighbor-diagonal propagation (consumption-aware extension).
    # The greedy parse extends factors across block boundaries without
    # fresh seeds; the raster analog lets each block adopt an adjacent
    # block's elected diagonal when evaluating it beats the block's own
    # election by a clear margin. This recovers sub-block islands whose
    # own votes are too sparse to elect (mosaic rearrangements), while the
    # density bound (EXT_MIN ~ the aw/am rule) keeps random terrain out;
    # candidates come only from neighbor continuity, never from secondary
    # vote clusters, so it cannot introduce new homology.
    ev = dict(K=K, Lq=Lq, Lr=Lr, NBF=NBF, NRT=NRT)

    def block_flags(Db, Sb, Ab):
        mm = _eval_on(q_fwd, r2dov, Db, Sb, Ab, rlen, qlens, **ev)
        return mm, jnp.sum(mm.reshape(K, NBF, FINE).astype(jnp.int32),
                           axis=-1)

    # Per-position flags ride along with the counts so the final m1 needs
    # no recompute: F always holds the flags of the current winner.
    # (Measured: wrapping this iteration in lax.fori_loop DOUBLES the
    # cold-compile time on v5e instead of shrinking it — the loop
    # boundary defeats fusion and triggers a slower compile path — so the
    # EXT_ITERS*2 trips stay unrolled.)
    F, cnt0 = block_flags(D, S, A)
    cnt_cur = jnp.where(A, cnt0, -1)
    for _ in range(EXT_ITERS):
        for shf in (_sh_r, _sh_l):
            Dc = shf(D, 1, jnp.int32(0))
            Sc = shf(S, 1, False)
            Ac = shf(A, 1, False)
            mmc, cntc = block_flags(Dc, Sc, Ac)
            better = Ac & (cntc >= EXT_MIN) & (cntc > cnt_cur + EXT_MARGIN)
            D = jnp.where(better, Dc, D)
            S = jnp.where(better, Sc, S)
            A = A | better
            cnt_cur = jnp.where(better, cntc, cnt_cur)
            F = jnp.where(jnp.repeat(better, FINE, axis=-1), mmc, F)

    Ap = _sh_r(A, 1, False)
    Sp = _sh_r(S, 1, False)
    Dp = _sh_r(D, 1, jnp.int32(0))

    # --- 3..7 shared back half (also used by the v3 MXU front end) ------
    m1 = F
    switchable = A & Ap & ((D != Dp) | (S != Sp))
    m0 = _eval_on(q_fwd, r2dov, Dp, Sp, switchable, rlen, qlens, **ev)
    return _blocks_to_measures(
        m1, m0, switchable, A, S, D, Ap, Sp, Dp, rlen, K=K, Lq=Lq,
        mqd=mqd, mrd=mrd, reg=reg, with_alns=with_alns, debug=debug,
        debug_extra=dict(vb=vb, votes=votes) if debug else None)


def _group_run_body(sv_f, pk1_f, pk2_f, sv_r, pk1_r, pk2_r, r2dov, qv,
                    r_rows, rlens, q_rows, qlens,
                    *, Lq, Lr, K, mqd, mrd, reg, pack_bits, C=None,
                    with_alns=False):
    """One device program for a chunk of dispatch rows: vmap over B rows,
    each row = one reference x K queries. r_rows/rlens: (B,), q_rows/qlens:
    (B, K). Returns (B, K, 3), plus (B, K, MAXSEG, 6) when with_alns."""
    core = partial(_row_core, Lq=Lq, Lr=Lr, K=K, mqd=mqd, mrd=mrd, reg=reg,
                   pack_bits=pack_bits, C=C, with_alns=with_alns)

    def row(rr, rl, qr, ql):
        return core(sv_f[rr], pk1_f[rr], pk2_f[rr], sv_r[rr], pk1_r[rr],
                    pk2_r[rr], r2dov[rr], rl, qv['fwd'][qr], qv['qsv'][qr],
                    qv['qoff'][qr], ql)

    return jax.vmap(row)(r_rows, rlens, q_rows, qlens)


_group_run = jax.jit(_group_run_body, static_argnames=(
    'Lq', 'Lr', 'K', 'mqd', 'mrd', 'reg', 'pack_bits', 'C', 'with_alns'))


@lru_cache(maxsize=128)
def _make_sharded_group_run(mesh, Lq, Lr, K, mqd, mrd, reg, pack_bits,
                            C=None, with_alns=False):
    """Pair-grid data parallelism over the mesh: the row axis of one
    bucket-combination group is sharded across devices; the genome arena
    is replicated (the sketch-allgather design of SURVEY.md section 7 —
    pair tiles ride ICI-free, each device runs its row slice)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    body = partial(_group_run_body, Lq=Lq, Lr=Lr, K=K, mqd=mqd, mrd=mrd,
                   reg=reg, pack_bits=pack_bits, C=C, with_alns=with_alns)
    rep = (P(),) * 7 + ({'fwd': P(), 'qsv': P(), 'qoff': P()},)
    sharded = (P(axis), P(axis), P(axis, None), P(axis, None))
    out = (P(axis, None, None), P(axis, None, None, None)) if with_alns \
        else P(axis, None, None)
    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=rep + sharded, out_specs=out))


@partial(jax.jit, static_argnames=('k', 'pack_bits', 'C'))
def _index_block(fwd, rc, k: int, pack_bits: int, C: int = None):
    """Per-genome device index build for one bucket chunk: stratified
    sampled query seeds (top-C per fine block by value hash) plus, per
    strand, value-sorted packed candidate arrays over the same sampling
    and the overlapped eval window rows. Sampling by VALUE keeps the two
    join sides consistent: a matching seed is kept or dropped on both
    sides together (ties inside a block resolve by position via the
    stable sort, so the selection is deterministic)."""
    G, Lp = fwd.shape
    C = SEEDS_PER_BLOCK if C is None else C
    NBF = Lp // FINE
    NQ = NBF * C
    kv = jax.vmap(partial(kmer_vals, k=k))
    qv_f = kv(fwd)
    qv_r = kv(rc)

    def select(qv_s):
        """Top-C seeds per fine block by value hash: (vals, offs) with
        vals = -1 where the block has fewer than C valid seeds."""
        v = qv_s.reshape(G, NBF, FINE)
        h = ((v.astype(jnp.uint32) * jnp.uint32(2654435761))
             >> 16).astype(jnp.int32)
        h = jnp.where(v < 0, BIG, h)
        off0 = jnp.broadcast_to(jnp.arange(FINE, dtype=jnp.int32), v.shape)
        hs, offs, vals = jax.lax.sort((h, off0, v), num_keys=1, dimension=2)
        sel_valid = hs[:, :, :C].reshape(G, NQ) < BIG
        sel_v = jnp.where(sel_valid, vals[:, :, :C].reshape(G, NQ), -1)
        return sel_v, offs[:, :, :C].reshape(G, NQ)

    qsv, qoff = select(qv_f)

    def strand(qv_s):
        sel_v, sel_off = select(qv_s)
        pos = ((jnp.arange(NQ, dtype=jnp.int32) // C) * FINE)[None, :] \
            + sel_off
        vs = jnp.where(sel_v < 0, BIG, sel_v)
        sv, spos = jax.lax.sort((vs, pos), num_keys=1, dimension=1)
        prev_same = jnp.concatenate(
            [jnp.zeros((G, 1), jnp.bool_), sv[:, 1:] == sv[:, :-1]], axis=1)
        spred = jnp.where(prev_same, _sh_r(spos, 1, jnp.int32(0)), -1)
        valid = sv < BIG
        if pack_bits == 32:
            # pos+1 keeps 0 as the unambiguous no-candidate sentinel (a
            # value-0 seed at position 0 would otherwise pack to 0); valid
            # seeds end >= k before the bucket edge so pos+1 < 2**16.
            pk1 = jnp.where(valid, (sv.astype(jnp.uint32) << 16)
                            | (spos.astype(jnp.uint32) + 1), 0)
            pk2 = jnp.where(valid & (spred >= 0),
                            (sv.astype(jnp.uint32) << 16)
                            | (spred.astype(jnp.uint32) + 1), 0)
            return sv, pk1, pk2
        # int64 triple pack: value<<40 | (pos+1)<<20 | (pred+1); the +1
        # reserves 0 as the no-candidate sentinel inside each field, and
        # the 20-bit position fields hold pos+1 up to 2**20 (MAX_TPU_LEN;
        # longer genomes are rejected at index build).
        p64 = (sv.astype(jnp.int64) << 40) \
            | ((spos.astype(jnp.int64) + 1) << 20) \
            | jnp.where(spred >= 0, spred.astype(jnp.int64) + 1, 0)
        pk1 = jnp.where(valid, p64, 0)
        return sv, pk1, pk1

    sv_f, pk1_f, pk2_f = strand(qv_f)
    sv_r, pk1_r, pk2_r = strand(qv_r)

    # Overlapped 64-wide window rows per 32 positions (both strands
    # stacked), with one all-pad lead row per strand so slightly-negative
    # window starts read never-matching pad bases instead of wrapping.
    pad = jnp.full((G, FINE), 4, jnp.int8)
    lead = jnp.full((G, 1, 2 * FINE), 4, jnp.int8)

    def rows(codes):
        a = jnp.concatenate([codes, pad], axis=1).reshape(G, -1, FINE)
        ov = jnp.concatenate([a[:, :-1], a[:, 1:]], axis=-1)
        return jnp.concatenate([lead, ov], axis=1)

    r2dov = jnp.concatenate([rows(fwd), rows(rc)], axis=1)
    return qsv, qoff, sv_f, pk1_f, pk2_f, sv_r, pk1_r, pk2_r, r2dov


class GenomeIndexTPU:
    """Device-resident per-bucket genome arena: padded codes, sampled
    query seed arrays and per-strand value-sorted packed candidate arrays
    + overlapped window rows (reference role). Buckets build LAZILY:
    all2all_tpu pads every pair to its max bucket (round 4), so only the
    diagonal (B, B) bucket programs compile — half the round-3 program
    count — and a genome is indexed at exactly the bucket sizes its pairs
    need. Each (bucket, genome-set) build is cached on the index."""

    def __init__(self, codes_list: Sequence[np.ndarray], k: int = SEED_K,
                 rows_chunk: int = 512):
        self.k = k
        self.rows_chunk = rows_chunk
        self.codes = [np.asarray(c, dtype=np.int8) for c in codes_list]
        self.lens = np.array([len(c) for c in self.codes], dtype=np.int32)
        self.bucket = {}   # Lp -> dict of stacked device arrays + row map
        # Genomes beyond the seed-pack position range are not indexed;
        # all2all_tpu rejects pairs touching them (models/align.py routes
        # such pairs to the exact native engine instead).
        self.oversized = {i for i, c in enumerate(self.codes)
                          if len(c) > MAX_TPU_LEN}

    def ensure(self, Lp: int, gids, C: int = None, cache: bool = True) \
            -> dict:
        """Arrays for bucket Lp covering at least genomes `gids`, sampled
        at C seeds per fine block (default SEEDS_PER_BLOCK). With
        cache=False, builds a DISPOSABLE sub-arena holding exactly `gids`
        (the VCLUST_ALIGN_MAX_ARENA bounded-HBM path) that is neither
        stored nor merged with the cached arena."""
        from ..core.seq import revcomp_codes
        C = SEEDS_PER_BLOCK if C is None else C
        cur = self.bucket.get((Lp, C)) if cache else None
        need = set(int(g) for g in gids)
        if cur is not None and need <= cur['rows'].keys():
            return cur
        members = sorted(need | (set(cur['rows']) if cur else set()))
        G = len(members)
        pack_bits = 32 if Lp <= 65536 else 64
        fwd = np.full((G, Lp), 4, dtype=np.int8)
        rc = np.full((G, Lp), 4, dtype=np.int8)
        rows = {}
        for row, i in enumerate(members):
            fwd[row, :self.lens[i]] = self.codes[i]
            rc[row, :self.lens[i]] = revcomp_codes(self.codes[i])
            rows[i] = row
        fwd_d = jnp.asarray(fwd)
        rc_d = jnp.asarray(rc)
        parts = []
        with _x64(pack_bits):
            for lo in range(0, G, self.rows_chunk):
                parts.append(_index_block(fwd_d[lo:lo + self.rows_chunk],
                                          rc_d[lo:lo + self.rows_chunk],
                                          self.k, pack_bits, C))
        qsv, qoff, sv_f, pk1_f, pk2_f, sv_r, pk1_r, pk2_r, r2dov = (
            jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            for xs in zip(*parts))
        d = dict(fwd=fwd_d, qsv=qsv, qoff=qoff, sv_f=sv_f, pk1_f=pk1_f,
                 pk2_f=pk2_f, sv_r=sv_r, pk1_r=pk1_r, pk2_r=pk2_r,
                 r2dov=r2dov, pack_bits=pack_bits, rows=rows)
        if cache:
            self.bucket[(Lp, C)] = d
        return d

    def ensure_v3(self, Lp: int, gids, cache: bool = True) -> dict:
        """v3 arrays for bucket Lp covering at least genomes `gids`:
        canonical occupancy matrices + wide window rows (no sampling
        knob — the matmul always runs at full seed density). cache=False
        builds a disposable exact-member sub-arena (bounded-HBM path)."""
        from ..core.seq import revcomp_codes
        key = (Lp, 'v3')
        cur = self.bucket.get(key) if cache else None
        need = set(int(g) for g in gids)
        if cur is not None and need <= cur['rows'].keys():
            return cur
        members = sorted(need | (set(cur['rows']) if cur else set()))
        G = len(members)
        fwd = np.full((G, Lp), 4, dtype=np.int8)
        rc = np.full((G, Lp), 4, dtype=np.int8)
        rows = {}
        for row, i in enumerate(members):
            fwd[row, :self.lens[i]] = self.codes[i]
            rc[row, :self.lens[i]] = revcomp_codes(self.codes[i])
            rows[i] = row
        fwd_d = jnp.asarray(fwd)
        rc_d = jnp.asarray(rc)
        parts = []
        for lo in range(0, G, self.rows_chunk):
            parts.append(_index_block_v3(fwd_d[lo:lo + self.rows_chunk],
                                         rc_d[lo:lo + self.rows_chunk],
                                         self.k, Lp))
        qocc, rocc, roww_f, roww_r = (
            jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
            for xs in zip(*parts))
        d = dict(fwd=fwd_d, qocc=qocc, rocc=rocc, roww_f=roww_f,
                 roww_r=roww_r, rows=rows)
        if cache:
            self.bucket[key] = d
        return d


# ==========================================================================
# v3 front end: MXU occupancy-matmul candidate generation + banded eval
# ==========================================================================
# Round-5 redesign of stages 1-2b driven by tools/microbench_r5.py: on v5e
# every content-addressed XLA primitive costs O(ns) per element (sort 1.9
# ns/elem, gathers 6.7 ns/row regardless of width, scatter 4.7) so the
# ~30k seed lookups per directed pair floor the v2 sort join at ~300 us
# and the vote-election small-row sorts at another ~150 us. The only
# units with headroom are the MXU and fused VPU elementwise chains, so v3
# replaces the join+election with:
#
#   1. **Canonical-k-mer occupancy matmul (MXU).** Per genome, a 0/1
#      occupancy matrix over V3_H hashed buckets of canonical 8-mers
#      (min(v, revcomp(v)) — strand-invariant, so ONE matrix serves both
#      strands and one matmul scores both orientations at once): query
#      blocks of V3_WQ positions x reference blocks of 32. M = Qocc @
#      Rocc^T gives shared-seed counts for every (query-block, ref-block)
#      combination; the argmax per query block is the coarse candidate
#      region. ~2.1 GFLOP bf16 per directed pair at the 64 kb bucket —
#      full seed density (no sampling) for less than the cost the v2 join
#      paid for 1/2 density.
#   2. **Banded base-level eval (fused VPU).** Around each coarse
#      candidate, all V3_BAND diagonal shifts are evaluated on the bases
#      directly: one wide window row-gather per coarse block (the only
#      gather), then an unrolled 32-step shift-compare-accumulate that
#      XLA fuses into a single pass. This replaces the fine/coarse vote
#      election sorts AND the eval/propagation re-evals of v2: the per-
#      fine-block elected diagonal is the band argmax, neighbor
#      propagation reads counts straight out of the band, and the final
#      match flags are a where-tree select from the same windows.
#   3. The shared back half (_blocks_to_measures) is unchanged.
#
# The mirror trick for the reverse strand: a canonical match at ref block
# g can be forward or reverse; the reverse candidate window is the mirror
# of [32g, 32g+32) in the rc string (true position rlen-32g-32, floored
# to the 32-grid; the band's +-slack absorbs the floor). Both strands'
# bands are evaluated and the per-fine-block winner takes all, with ties
# preferring the forward strand like v2's smallest-code rule.
#
# Large buckets route back to v2: the matmul is quadratic in bucket size
# (fine through V3_MAX_BUCKET, the v2 sort join scales better beyond).

V3_H = _env_num('VCLUST_ALIGN_V3_H', 2048, 256, 16384)
#                    hashed canonical-seed buckets of the occupancy
#                    matrices. SNR argument: a 128-wide query block holds
#                    ~120 seeds, a 32-wide ref block ~28, so collision
#                    noise per cell is ~120*28/2048 = 1.6 +- 1.3 while
#                    true blocks at 75% identity share ~12 seeds.
V3_WQ = _env_num('VCLUST_ALIGN_V3_WQ', 128, 64, 512)
#                    stage-1 query block width (multiple of 32; all
#                    length buckets divide by 128). Wider = cheaper
#                    matmul + better SNR but a wider eval band.
V3_SMIN = _env_num('VCLUST_ALIGN_V3_SMIN', 5, 1, 512)
#                    stage-1 shared-seed count a coarse candidate needs
#                    before its fine blocks may elect (junk guard).
V3_TBAND = _env_num('VCLUST_ALIGN_V3_TBAND', 17, 1, 32)
#                    base matches (of FINE) the band winner needs to
#                    elect — the aw/am density bound (>= 53%), same
#                    constant as EXT_MIN.
V3_MAX_BUCKET = _env_num('VCLUST_ALIGN_V3_MAXB', 131072, 4096, 1 << 20)
V3_CONT = _env_num('VCLUST_ALIGN_V3_CONT', 6, 0, 32)
#                    continuity slack: a neighbor block's diagonal is
#                    adopted when its band count comes within this many
#                    matches of the block's own election — the greedy
#                    parse strongly prefers CONTINUING a factor over
#                    jumping to an equally-scoring duplicate copy.
V3_RERUN_COV = _env_num('VCLUST_ALIGN_V3_COV', 0.997, 0.0, 1.0, cast=float)
#                    hybrid accuracy net: pairs the v3 pipe leaves with
#                    query or reference coverage below this (at tANI >
#                    0.05) are structurally hard (heavy duplication /
#                    mosaic rearrangement) and re-align on the v2
#                    sort-join pipe at full density. Clean mutants cover
#                    ~0.999 and junk stays below the tANI floor, so the
#                    rerun set is the mosaic minority. 0 disables.
#                    Threshold placement (example corpus, round 5): every
#                    pair the v3 pipe gets wrong by > 0.005 tANI shows
#                    min-coverage <= 0.9958, every pair within 0.004
#                    shows >= 0.9977 — 0.997 splits the gap.
MAX_ARENA = _env_num('VCLUST_ALIGN_MAX_ARENA', 0, 0, 1 << 30)
#                    bound on genomes resident per bucket arena (0 = no
#                    bound). When a group's genome set exceeds it, the
#                    group splits into sub-groups processed on DISPOSABLE
#                    exact-member sub-arenas, bounding device HBM by
#                    ~MAX_ARENA x per-genome index bytes instead of the
#                    whole bucket population (the million-genome mesh
#                    configs of BASELINE.json; README known-limitations).


def _v3_geom(Lq, Lr):
    WQ = V3_WQ
    BAND = WQ + 96          # diagonal shifts evaluated per fine block
    WIN = BAND + FINE       # per-fine-block window width
    ROWW = -(-(WQ - 16 + WIN) // 32) * 32   # wide window row width
    return dict(WQ=WQ, BAND=BAND, WIN=WIN, ROWW=ROWW,
                NQB=Lq // WQ, NRB=Lr // FINE, FPB=WQ // FINE)


def _canon_hash(vals):
    """Hash bucket of the canonical 8-mer for packed values (int32, -1 =
    invalid): min(v, revcomp(v)) through a Knuth multiplicative hash.
    Returns -1 for invalid positions (dropped by scatter)."""
    rc = jnp.zeros_like(vals)
    t = vals
    for _ in range(SEED_K):
        rc = (rc << 2) | ((t & 3) ^ 3)
        t = t >> 2
    vc = jnp.minimum(vals, rc).astype(jnp.uint32)
    shift = 32 - int(np.log2(V3_H))
    h = (vc * jnp.uint32(2654435761)) >> shift
    return jnp.where(vals >= 0, h.astype(jnp.int32), -1)


@partial(jax.jit, static_argnames=('k', 'Lp'))
def _index_block_v3(fwd, rc, k: int, Lp: int):
    """Per-genome v3 device index for one bucket chunk: canonical
    occupancy matrices (query blocks of WQ / ref blocks of FINE) and the
    wide window rows both strands. fwd/rc: (G, Lp) int8 codes."""
    g3 = _v3_geom(Lp, Lp)
    WQ, NQB, NRB, ROWW = g3['WQ'], g3['NQB'], g3['NRB'], g3['ROWW']
    G = fwd.shape[0]
    vals = jax.vmap(partial(kmer_vals, k=k))(fwd)
    h = _canon_hash(vals)                          # (G, Lp)
    gi = jnp.arange(G, dtype=jnp.int32)[:, None]
    pos = jnp.arange(Lp, dtype=jnp.int32)[None, :]
    one = jnp.ones((G, Lp), jnp.int8)
    # Query occupancy at HALF-block (WQ/2) granularity: stage 1 sums
    # half pairs for the robust coarse argmax and uses the dissenting
    # half's own argmax as the positional mosaic-rescue candidate.
    qocc = jnp.zeros((G, 2 * NQB, V3_H), jnp.int8).at[
        gi, pos // (WQ // 2), h].max(one, mode='drop')
    rocc = jnp.zeros((G, NRB, V3_H), jnp.int8).at[
        gi, pos // FINE, h].max(one, mode='drop')

    def rows(codes):
        lead = jnp.full((G, WQ + 32), 4, jnp.int8)
        tail = jnp.full((G, ROWW), 4, jnp.int8)
        P = jnp.concatenate([lead, codes, tail], axis=1)
        return jnp.concatenate(
            [P[:, 32 * j:32 * j + NRB * 32].reshape(G, NRB, 32)
             for j in range(ROWW // 32)], axis=-1)   # (G, NRB, ROWW)

    return qocc, rocc, rows(fwd), rows(rc)


def _tree_slice(w, t, out_width, tmax):
    """w[..., t:t+out_width] for per-element t in [0, tmax] via a binary
    where-tree of static slices (no gathers). Requires
    w.shape[-1] >= tmax + out_width (true for all band selects); w is
    padded up to the exact budget T2 + out_width - 1 (T2 = next pow2
    above tmax) so every slice is statically in bounds."""
    T2 = 1 << int(tmax).bit_length()
    W0 = T2 + out_width - 1
    if w.shape[-1] < W0:
        pad = jnp.zeros(w.shape[:-1] + (W0 - w.shape[-1],), w.dtype)
        out = jnp.concatenate([w, pad], axis=-1)
    else:
        out = w[..., :W0]
    bit = T2 >> 1
    while bit:
        keep = out.shape[-1] - bit
        out = jnp.where((t & bit > 0)[..., None], out[..., bit:bit + keep],
                        out[..., :keep])
        bit >>= 1
    return out[..., :out_width]


def _row_core_v3(rocc, roww_f, roww_r, rlen, q_fwd, qocc, qlens,
                 tband, smin,
                 *, Lq, Lr, K, mqd, mrd, reg, ncand=2, with_alns=False,
                 debug=False):
    """v3 aggregates for K directed pairs sharing one reference.

    rocc: (NRB, H) int8; roww_f/roww_r: (NRB, ROWW) int8; qocc:
    (K, NQB, H) int8; q_fwd: (K, Lq) int8; rlen scalar, qlens (K,);
    tband/smin: TRACED election thresholds (int32 scalars) so threshold
    tuning re-dispatches without recompiling."""
    g3 = _v3_geom(Lq, Lr)
    WQ, BAND, WIN, NQB, NRB, FPB = (g3['WQ'], g3['BAND'], g3['WIN'],
                                    g3['NQB'], g3['NRB'], g3['FPB'])
    NBF = Lq // FINE

    # --- 1. stage-1 occupancy matmul + dissenting-half coarse argmax.
    # NRB-chunked: the full score matrix (K x NQB x NRB int32) would be
    # the fattest array in the program (~34 MB/row at the 64 kb bucket),
    # capping dispatch size; chunked matmul+pack+max keeps only
    # (K, 2*NQB, CH) alive and runs the native int8 MXU path (~343
    # TFLOPs measured vs 175 bf16, tools/microbench_r5b.py). The matmul
    # runs at HALF-block (WQ/2) granularity: candidate 1 per coarse
    # block is the argmax of the half SUM (robust SNR for weak
    # homology), candidate 2 the argmax of whichever half disagrees
    # more — an inversion/translocation boundary inside a coarse block
    # gives its halves different homes (the positional mosaic rescue).
    # Ties prefer the LARGER ref block: the LZ parse links factors to
    # the most recent occurrence of a repeat (v2's join kept the last-2
    # occurrences for the same reason).
    CH = min(NRB, 512)
    # Backend-dependent matmul dtype: the native s8xs8->s32 path is ~2x
    # bf16 on the v5e MXU, but XLA *CPU* compiles batched int8 dots in
    # time linear in the vmap width (~200 s per bucket program at B=33,
    # measured) while bf16 einsums compile flat — and bf16 sums of 0/1
    # occupancies are exact below 256.
    use_i8 = jax.default_backend() != 'cpu'
    c_sum, c_a, c_b = [], [], []
    for lo in range(0, NRB, CH):
        hi = min(lo + CH, NRB)
        if use_i8:
            Mc = jax.lax.dot_general(
                qocc, rocc[lo:hi], (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)     # (K, 2*NQB, hi-lo)
        else:
            Mc = jnp.einsum(
                'kqh,rh->kqr', qocc.astype(jnp.bfloat16),
                rocc[lo:hi].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        Ma = Mc[:, 0::2]
        Mb = Mc[:, 1::2]
        rr_ = jnp.arange(lo, hi, dtype=jnp.int32)
        c_sum.append(jnp.max(((Ma + Mb) << 13) | rr_, axis=-1))
        if ncand > 1:
            c_a.append(jnp.max((Ma << 13) | rr_, axis=-1))
            c_b.append(jnp.max((Mb << 13) | rr_, axis=-1))
    best = jnp.max(jnp.stack(c_sum, axis=-1), axis=-1)
    cnt1 = best >> 13                              # (K, NQB)
    g1 = best & 8191
    if ncand > 1:
        ba = jnp.max(jnp.stack(c_a, axis=-1), axis=-1)
        bb_ = jnp.max(jnp.stack(c_b, axis=-1), axis=-1)
        ga, gb = ba & 8191, bb_ & 8191
        use_a = jnp.abs(ga - g1) >= jnp.abs(gb - g1)
        g2 = jnp.where(use_a, ga, gb)
        cnt2 = jnp.where(use_a, ba, bb_) >> 13     # half-block count
    if _ABLATE == 'join':
        s = jnp.sum(cnt1, axis=-1) + jnp.sum(g1, axis=-1)
        return jnp.stack([s, s, s], axis=-1)

    # --- 2. window rows (the only gathers: one wide row per coarse
    # block per candidate per strand) ------------------------------------
    def mirror(g):
        return jnp.clip((rlen - 32 * g - 32) >> 5, 0, NRB - 1)

    def fine_windows(row):
        w = jnp.stack([row[..., u * 32 + 16: u * 32 + 16 + WIN]
                       for u in range(FPB)], axis=-2)
        return w.reshape(K, NBF, WIN)

    qb = q_fwd.reshape(K, NBF, FINE)
    qok = qb < 4

    # --- 3. banded base eval: 32-step fused shift-compare-accumulate ----
    def band_counts(w):
        acc = None
        for p in range(FINE):
            e = ((w[..., p:p + BAND] == qb[..., p:p + 1])
                 & qok[..., p:p + 1]).astype(jnp.int8)
            acc = e if acc is None else acc + e
        return acc                                  # (K, NBF, BAND) int8

    fc = jnp.arange(NBF, dtype=jnp.int32) // FPB   # coarse block of fb
    Qs = fc * WQ

    def mkband(g, strand_rows, is_rc, cn):
        w = fine_windows(strand_rows[g])
        base = (32 * g)[:, fc] - Qs[None, :] - WQ - 16
        return dict(base=base, cnt=band_counts(w), win=w, is_rc=is_rc,
                    cand1=cn == 0)

    bands = [mkband(g1, roww_f, False, 0), mkband(mirror(g1), roww_r,
                                                  True, 0)]
    if ncand > 1:
        bands += [mkband(g2, roww_f, False, 1), mkband(mirror(g2),
                                                       roww_r, True, 1)]

    # --- 4. election across all bands; ties prefer candidate 1, then
    # the forward strand, then the smaller shift (v2's smallest-code
    # rule) ---------------------------------------------------------------
    tvec = jnp.arange(BAND, dtype=jnp.int32)   # count ties -> larger t
    bb = None
    for b_ in bands:
        tag = (2048 if b_['cand1'] else 0) | (0 if b_['is_rc'] else 1024)
        p_ = jnp.max((b_['cnt'].astype(jnp.int32) << 12) | tag | tvec,
                     axis=-1)
        bb = p_ if bb is None else jnp.maximum(bb, p_)
    cnt_best = bb >> 12
    C1 = (bb & 2048) > 0
    S = (bb & 1024) == 0                           # True = reverse strand
    t_el = bb & 511
    base1 = jnp.where(S, bands[1]['base'], bands[0]['base'])
    if ncand > 1:
        base_sel = jnp.where(C1, base1,
                             jnp.where(S, bands[3]['base'],
                                       bands[2]['base']))
        # cand2 carries HALF-block counts; gate it against smin/2 (>= 3)
        # so weak-homology halves are not starved out.
        gate_ok = jnp.where(C1, cnt1[:, fc] >= smin,
                            cnt2[:, fc] >= jnp.maximum(smin // 2, 3))
    else:
        base_sel = base1
        gate_ok = cnt1[:, fc] >= smin
    D = base_sel + t_el
    # Election thresholds scale down on partial tail blocks (fewer than
    # FINE valid query positions can never reach the full-block bound).
    vq = jnp.sum(qok.astype(jnp.int32), axis=-1)
    tband_b = jnp.minimum(tband, jnp.maximum(4, (vq * tband) // FINE))
    A = (cnt_best >= tband_b) & gate_ok
    if _ABLATE == 'elect':
        s = jnp.sum(jnp.where(A, D, 0), axis=-1) + jnp.sum(cnt_best, -1)
        return jnp.stack([s, s, s], axis=-1)

    # --- 5. propagation: neighbors' diagonals read straight out of the
    # band counts (no re-eval); any band containing the diagonal serves -
    def count_at(Sx, Dx):
        out = None
        for b_ in bands:
            tn = Dx - b_['base']
            ok = (Sx == b_['is_rc']) & (tn >= 0) & (tn < BAND)
            cv = _tree_slice(b_['cnt'], jnp.clip(tn, 0, BAND - 1), 1,
                             BAND - 1)[..., 0].astype(jnp.int32)
            cv = jnp.where(ok, cv, -1)
            out = cv if out is None else jnp.maximum(out, cv)
        return out

    cnt_cur = jnp.where(A, cnt_best, -1)
    for _ in range(EXT_ITERS):
        for shf in (_sh_r, _sh_l):
            Dn = shf(D, 1, jnp.int32(0))
            Sn = shf(S, 1, False)
            An = shf(A, 1, False)
            diff = (Dn != D) | (Sn != S)
            cn = jnp.where(An & diff, count_at(Sn, Dn), -1)
            # Tier 1: rescue — the neighbor diagonal clearly beats the
            # block's own election (or the block elected nothing).
            better = (cn >= EXT_MIN) & (cn > cnt_cur + EXT_MARGIN)
            # Tier 2: continuity — near-equal counts resolve toward the
            # neighbor's chain like the greedy parse's factor extension
            # (consumption-aware assignment: count-argmax alone picks
            # duplicate copies that break the chain).
            cont = A & (cn >= EXT_MIN) & (cn + V3_CONT >= cnt_cur) \
                & (cn <= cnt_cur)
            adopt = better | cont
            D = jnp.where(adopt, Dn, D)
            S = jnp.where(adopt, Sn, S)
            A = A | better
            cnt_cur = jnp.where(adopt, cn, cnt_cur)

    # --- 6. final per-position flags from the windows (bands holding the
    # same (strand, diagonal) show the same reference bases, so OR-ing
    # across containing bands is exact) ----------------------------------
    def flags_at(Sx, Dx, okx):
        m = None
        for b_ in bands:
            tn = Dx - b_['base']
            ok = okx & (Sx == b_['is_rc']) & (tn >= 0) & (tn < BAND)
            seg = _tree_slice(b_['win'], jnp.clip(tn, 0, BAND - 1), FINE,
                              BAND - 1)
            mx = (qb == seg) & qok & ok[..., None]
            m = mx if m is None else m | mx
        return m.reshape(K, Lq)

    m1 = flags_at(S, D, A)
    Ap = _sh_r(A, 1, False)
    Sp = _sh_r(S, 1, False)
    Dp = _sh_r(D, 1, jnp.int32(0))
    switchable = A & Ap & ((D != Dp) | (S != Sp))
    m0 = flags_at(Sp, Dp, switchable)
    if _ABLATE == 'eval':
        s = jnp.sum(m1.astype(jnp.int32), axis=-1)
        return jnp.stack([s, s, s], axis=-1)
    return _blocks_to_measures(
        m1, m0, switchable, A, S, D, Ap, Sp, Dp, rlen, K=K, Lq=Lq,
        mqd=mqd, mrd=mrd, reg=reg, with_alns=with_alns, debug=debug,
        debug_extra=dict(cnt1=cnt1, g1=g1, cnt_best=cnt_best,
                         band_best=[jnp.max(b_['cnt'], axis=-1)
                                    for b_ in bands],
                         **(dict(g2=g2, cnt2=cnt2) if ncand > 1 else {}))
        if debug else None)


def _group_run_v3_body(rocc, roww_f, roww_r, qv, r_rows, rlens, q_rows,
                       qlens, thresholds, *, Lq, Lr, K, mqd, mrd, reg,
                       with_alns=False):
    core = partial(_row_core_v3, Lq=Lq, Lr=Lr, K=K, mqd=mqd, mrd=mrd,
                   reg=reg, with_alns=with_alns)

    def row(rr, rl, qr, ql):
        return core(rocc[rr], roww_f[rr], roww_r[rr], rl,
                    qv['fwd'][qr], qv['qocc'][qr], ql,
                    thresholds[0], thresholds[1])

    return jax.vmap(row)(r_rows, rlens, q_rows, qlens)


_group_run_v3 = jax.jit(_group_run_v3_body, static_argnames=(
    'Lq', 'Lr', 'K', 'mqd', 'mrd', 'reg', 'with_alns'))


@lru_cache(maxsize=128)
def _make_sharded_group_run_v3(mesh, Lq, Lr, K, mqd, mrd, reg,
                               with_alns=False):
    """v3 analog of _make_sharded_group_run: dispatch rows sharded over
    the mesh, arena replicated."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    body = partial(_group_run_v3_body, Lq=Lq, Lr=Lr, K=K, mqd=mqd,
                   mrd=mrd, reg=reg, with_alns=with_alns)
    rep = (P(), P(), P(), {'fwd': P(), 'qocc': P()})
    sharded = (P(axis), P(axis), P(axis, None), P(axis, None), P(None))
    out = (P(axis, None, None), P(axis, None, None, None)) if with_alns \
        else P(axis, None, None)
    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=rep + sharded, out_specs=out))


def _batch_rows_v3(L: int, K: int) -> int:
    """v3 dispatch rows per chunk. With the NRB-chunked stage 1 the
    fattest live arrays are the four candidate bands' count + window
    int8 arrays (K * NBF * (BAND + WIN) each); bound those to ~1.5 GB
    and cap at 512 rows. Measured sweet spot (tools: chip B sweep,
    round 5): ~32 rows at the 64 kb bucket — beyond that XLA's buffer
    pressure erases the saved tunnel round-trips — and the full 512 for
    contig buckets, where dispatch submission latency dominates."""
    g3 = _v3_geom(L, L)
    per_row = 4 * K * (L // FINE) * (g3['BAND'] + g3['WIN']) \
        + K * g3['NQB'] * 512 * 8
    cap = 16 if jax.default_backend() == 'cpu' else 512
    return max(1, min(cap, (1536 << 20) // per_row))


def _batch_rows(Lq: int, Lr: int, K: int, C: int) -> int:
    """Dispatch rows per chunk: bound the sort working set (~8M join
    entries per dispatch) so device work per dispatch stays >> launch
    overhead at every bucket size without blowing HBM (a 512-row cap was
    measured SLOWER on the contig corpus — scheduling/HBM pressure beats
    the saved dispatch latency)."""
    W = (Lr // FINE) * C + K * (Lq // FINE) * C
    return max(4, min(128, (1 << 23) // W))


PHASE1_C = _env_num('VCLUST_ALIGN_P1C', 8, 1, 32)
RERUN_LO = _env_num('VCLUST_ALIGN_RERUN_LO', 0.10, 0.0, 1.0, cast=float)
RERUN_HI = _env_num('VCLUST_ALIGN_RERUN_HI', 0.97, 0.0, 1.0, cast=float)
TWO_PHASE_MIN_BUCKET = _env_num('VCLUST_ALIGN_TP_MIN', 16384, 0, 1 << 30)


def all2all_tpu(codes_list: Sequence[np.ndarray], pairs: np.ndarray,
                params: Optional[AlignParams] = None,
                index: Optional[GenomeIndexTPU] = None,
                mesh=None, keep_alignments: bool = False,
                seeds_per_block: Optional[int] = None):
    """Two-phase all-vs-all (the default path): phase 1 screens EVERY
    pair at sparse seed sampling (PHASE1_C = C/4 of the join width, ~half
    the sort cost — measured accurate for strong homology and junk), then
    phase 2 re-aligns only the weak-homology band (RERUN_LO < tANI <
    RERUN_HI, where sparse sampling measurably starves the diagonal
    election) at full density. All-vs-all corpora are dominated by junk +
    strong-mutant pairs, so the rerun set is small. Explicit
    `seeds_per_block`, `keep_alignments`, or VCLUST_ALIGN_TWO_PHASE=0
    selects the single-phase path.

    Reproducibility note (user-facing, also in README): because
    keep_alignments forces single-phase full density, aggregate measures
    for pairs outside the rerun band can differ at the last decimals
    between runs with and without --out-aln; set VCLUST_ALIGN_TWO_PHASE=0
    to force identical single-phase measures in both modes. Band
    classification uses padded code lengths (including 64-N contig
    joiners), a <0.1% bias on the classification threshold only."""
    idx = index or GenomeIndexTPU(codes_list)
    pairs = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
    pipe = _os_tune.environ.get('VCLUST_ALIGN_PIPE', 'v3')
    if pipe not in ('v2', 'v3'):
        raise ValueError(f'VCLUST_ALIGN_PIPE={pipe!r}: expected v2 or v3')
    if seeds_per_block is not None:
        pipe = 'v2'      # explicit sampling density = v2 tuning path
    if pipe == 'v3':
        # v3 always runs at full seed density — no sampling screen
        # needed; buckets beyond V3_MAX_BUCKET fall back to v2 per group
        # inside. Structurally hard pairs (coverage gap at real
        # homology) then re-align on the v2 pipe: the MXU pipe's two
        # candidate regions per coarse block can miss third regions in
        # heavy duplication mosaics, where v2's global vote election is
        # the stronger (and slower) tool.
        res = _all2all_single(codes_list, pairs, params, idx, mesh,
                              keep_alignments, SEEDS_PER_BLOCK, pipe='v3')
        if V3_RERUN_COV <= 0 or not len(pairs):
            return res
        out = res[0] if keep_alignments else res
        lens_ = idx.lens.astype(np.int64)
        lj = np.maximum(lens_[pairs[:, 1]], 1)   # q of direction 1
        li = np.maximum(lens_[pairs[:, 0]], 1)
        tani = (out[:, 1] + out[:, 4]) / (lj + li)
        hard = (tani > 0.05) & ((out[:, 2] / lj < V3_RERUN_COV)
                                | (out[:, 5] / li < V3_RERUN_COV))
        if not hard.any():
            return res
        sub = _all2all_single(codes_list, pairs[hard], params, idx, mesh,
                              keep_alignments, SEEDS_PER_BLOCK, pipe='v2')
        if not keep_alignments:
            out[hard] = sub
            return out
        out[hard] = sub[0]
        rows_v3, counts_v3 = res[1]
        rows_v2, counts_v2 = sub[1]
        offs3 = np.zeros(len(counts_v3) + 1, dtype=np.int64)
        np.cumsum(counts_v3, out=offs3[1:])
        offs2 = np.zeros(len(counts_v2) + 1, dtype=np.int64)
        np.cumsum(counts_v2, out=offs2[1:])
        hard_idx = {int(p): k for k, p in enumerate(np.flatnonzero(hard))}
        blocks, counts = [], np.zeros_like(counts_v3)
        for prow in range(len(pairs)):
            for d in range(2):
                if prow in hard_idx:
                    k = hard_idx[prow]
                    lo, hi = offs2[2 * k + d], offs2[2 * k + d + 1]
                    blocks.append(rows_v2[lo:hi])
                else:
                    lo, hi = offs3[2 * prow + d], offs3[2 * prow + d + 1]
                    blocks.append(rows_v3[lo:hi])
                counts[2 * prow + d] = len(blocks[-1])
        rows_all = (np.concatenate(blocks) if blocks
                    else np.empty((0, 6), np.int32))
        return out, (rows_all, counts)
    single = (seeds_per_block is not None or keep_alignments
              or len(pairs) == 0
              or _os_tune.environ.get('VCLUST_ALIGN_TWO_PHASE') == '0')
    if single:
        return _all2all_single(codes_list, pairs, params, idx, mesh,
                               keep_alignments,
                               seeds_per_block or SEEDS_PER_BLOCK)
    lens = idx.lens.astype(np.int64)
    # Small buckets are dispatch-latency-bound (measured: the screen's
    # savings vanish below the per-dispatch floor), so two-phase applies
    # only to pairs whose padded bucket reaches TWO_PHASE_MIN_BUCKET.
    kb = np.array([max(_pad_bucket(int(lens[i])), _pad_bucket(int(lens[j])))
                   for i, j in pairs], dtype=np.int64)
    big = kb >= TWO_PHASE_MIN_BUCKET
    out = np.zeros((len(pairs), 6), dtype=np.int64)
    if (~big).any():
        out[~big] = _all2all_single(codes_list, pairs[~big], params, idx,
                                    mesh, False, SEEDS_PER_BLOCK)
    if big.any():
        pb = pairs[big]
        o1 = _all2all_single(codes_list, pb, params, idx, mesh, False,
                             PHASE1_C)
        pair_len = lens[pb[:, 0]] + lens[pb[:, 1]]
        tani1 = (o1[:, 1] + o1[:, 4]) / np.maximum(pair_len, 1)
        band = (tani1 > RERUN_LO) & (tani1 < RERUN_HI)
        if band.any():
            o1[band] = _all2all_single(codes_list, pb[band], params, idx,
                                       mesh, False, SEEDS_PER_BLOCK)
        out[big] = o1
    return out


def _split_group(by_ref: dict, cap: int) -> list:
    """Partition one bucket group's {ref: tasks} map into sub-groups whose
    genome footprint (refs + queries) stays <= cap. Greedy over refs in
    sorted order; a single ref whose own task list exceeds the cap is
    split across sub-groups by task chunks."""
    subs = []
    cur, cur_g = {}, set()
    for ri in sorted(by_ref):
        ts = by_ref[ri]
        lo = 0
        while lo < len(ts):
            room = cap - len(cur_g) - (0 if ri in cur_g else 1)
            take = [t for t in ts[lo:] ]
            picked = []
            for t in take:
                extra = 0 if t[0] in cur_g or t[0] == ri else 1
                if room - extra < 0:
                    break
                room -= extra
                picked.append(t)
                cur_g.add(t[0])
            if picked:
                cur_g.add(ri)
                cur.setdefault(ri, []).extend(picked)
                lo += len(picked)
            if lo < len(ts):            # ran out of room: flush
                if cur:
                    subs.append(cur)
                cur, cur_g = {}, set()
    if cur:
        subs.append(cur)
    return subs


def _all2all_single(codes_list: Sequence[np.ndarray], pairs: np.ndarray,
                    params: Optional[AlignParams],
                    index: GenomeIndexTPU,
                    mesh, keep_alignments: bool,
                    seeds_per_block: int, pipe: str = 'v2'):
    """All-vs-all aggregates on TPU for unordered candidate `pairs` over
    ids-ordered genomes. Returns int64 array (len(pairs), 6) with columns
    (n_ji, match_ji, alnlen_ji, n_ij, match_ij, alnlen_ij), the same layout
    as lz_native.all2all_native's aggregate output. With `mesh`, each
    group's row axis is sharded over the mesh devices.

    keep_alignments=True additionally returns (aln_rows, aln_counts) in
    lz_native's layout (reference --out-alignment contract,
    vclust.py:1127-1133): aln_rows int32 (N, 6) = (qstart, qend, rstart,
    rend, nt_match, nt_mismatch), 0-based, reverse strand as
    rstart > rend; aln_counts (2 * len(pairs),) rows per directed task,
    (q=j,r=i) first. Segments past the per-pair record cap (MAXSEG) are
    dropped from the rows (aggregates stay exact)."""
    params = params or AlignParams()
    C = seeds_per_block
    mqd, mrd, reg = params.mqd, params.mrd, params.reg
    idx = index
    lens = idx.lens
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev <= 1:
        mesh = None

    # Directed tasks grouped by the PAIR's max bucket (both sides padded
    # to it, so only diagonal (B, B) programs ever compile), then by
    # reference genome so each dispatch row amortizes its reference join
    # K ways.
    groups: Dict[int, Dict[int, List]] = {}
    for prow, (i, j) in enumerate(pairs):
        i, j = int(i), int(j)
        if i in idx.oversized or j in idx.oversized:
            raise ValueError(
                f'pair ({i}, {j}) touches a genome longer than '
                f'{MAX_TPU_LEN} bases — beyond the TPU engine\'s seed-pack '
                f'position range; align it with the native engine')
        kb = max(_pad_bucket(lens[i]), _pad_bucket(lens[j]))
        for (qi, ri, col) in ((j, i, 0), (i, j, 3)):
            groups.setdefault(kb, {}).setdefault(ri, []).append(
                (qi, prow, col))

    import time as _time
    _timing = _os_tune.environ.get('VCLUST_ALIGN_TIMING')
    out = np.zeros((len(pairs), 6), dtype=np.int64)
    pending = []   # (device results list, row task lists)
    work = []      # (kb, by_ref_subset, cacheable)
    for kb, by_ref in sorted(groups.items()):
        gids = set(by_ref)
        for ts in by_ref.values():
            gids.update(qi for (qi, _p, _c) in ts)
        if MAX_ARENA and len(gids) > MAX_ARENA:
            work += [(kb, sub, False)
                     for sub in _split_group(by_ref, max(MAX_ARENA, 2))]
        else:
            work.append((kb, by_ref, True))
    for kb, by_ref, cacheable in work:
        gids = set(by_ref)
        for ts in by_ref.values():
            gids.update(qi for (qi, _p, _c) in ts)
        _t0 = _time.time()
        use_v3 = pipe == 'v3' and kb <= V3_MAX_BUCKET
        b = idx.ensure_v3(kb, gids, cache=cacheable) if use_v3 \
            else idx.ensure(kb, gids, C, cache=cacheable)
        if _timing:
            print(f'[timing] ensure({kb}, {len(gids)}): '
                  f'{_time.time() - _t0:.1f}s', flush=True)
        K = K_QUERIES
        max_tasks = max(len(ts) for ts in by_ref.values())
        if max_tasks < K:
            K = max(1, 1 << (max_tasks - 1).bit_length())
        rows = []        # (ref_idx, [task, ...] of length <= K)
        for ri in sorted(by_ref):
            ts = by_ref[ri]
            for lo in range(0, len(ts), K):
                rows.append((ri, ts[lo:lo + K]))
        B = _batch_rows_v3(kb, K) if use_v3 else _batch_rows(kb, kb, K, C)
        if mesh is not None:
            B = max(B // n_dev, 1) * n_dev
        n_disp = -(-len(rows) // B)
        r_rows = np.zeros(n_disp * B, np.int32)
        rlens = np.zeros(n_disp * B, np.int32)
        q_rows = np.zeros((n_disp * B, K), np.int32)
        qlens = np.zeros((n_disp * B, K), np.int32)
        # Per-task placement arrays double as the vectorized scatter-back
        # map (task -> output row/direction) for the fetch loop below.
        t_w = []
        t_i_ = []
        t_prow = []
        t_col = []
        for w, (ri, ts) in enumerate(rows):
            r_rows[w] = b['rows'][ri]
            rlens[w] = lens[ri]
            for t_i, (qi, prow_, col_) in enumerate(ts):
                q_rows[w, t_i] = b['rows'][qi]
                qlens[w, t_i] = lens[qi]
                t_w.append(w)
                t_i_.append(t_i)
                t_prow.append(prow_)
                t_col.append(col_)
        tmap = (np.asarray(t_w, np.int64), np.asarray(t_i_, np.int64),
                np.asarray(t_prow, np.int64), np.asarray(t_col, np.int64))
        if use_v3:
            arena = (b['rocc'], b['roww_f'], b['roww_r'],
                     {'fwd': b['fwd'], 'qocc': b['qocc']})
            static = dict(Lq=kb, Lr=kb, K=K, mqd=mqd, mrd=mrd, reg=reg,
                          with_alns=keep_alignments)
        else:
            arena = (b['sv_f'], b['pk1_f'], b['pk2_f'], b['sv_r'],
                     b['pk1_r'], b['pk2_r'], b['r2dov'],
                     {'fwd': b['fwd'], 'qsv': b['qsv'], 'qoff': b['qoff']})
            static = dict(Lq=kb, Lr=kb, K=K, mqd=mqd, mrd=mrd, reg=reg,
                          pack_bits=b['pack_bits'], C=C,
                          with_alns=keep_alignments)
        if mesh is not None:
            from ..parallel.distributed import replicate, shard_rows
            run = (_make_sharded_group_run_v3 if use_v3
                   else _make_sharded_group_run)(mesh, **static)
            arena = tuple(
                {k2: replicate(mesh, v) for k2, v in a.items()}
                if isinstance(a, dict) else replicate(mesh, a)
                for a in arena)
            place = partial(shard_rows, mesh)
        else:
            run = partial(_group_run_v3 if use_v3 else _group_run, **static)
            place = jnp.asarray
        results = []
        if use_v3:
            thr = np.array([V3_TBAND, V3_SMIN], np.int32)
            if mesh is not None:
                from ..parallel.distributed import replicate
                extra = (replicate(mesh, thr),)
            else:
                extra = (jnp.asarray(thr),)
        else:
            extra = ()
        with _x64(b.get('pack_bits', 32)):
            for d in range(n_disp):
                _t0 = _time.time()
                lo, hi = d * B, (d + 1) * B
                results.append(run(
                    *arena, place(r_rows[lo:hi]), place(rlens[lo:hi]),
                    place(q_rows[lo:hi]), place(qlens[lo:hi]), *extra))
                if _timing:
                    results[-1][0].block_until_ready() if keep_alignments \
                        else results[-1].block_until_ready()
                    print(f'[timing] group({kb}) K={K} B={B} disp {d}: '
                          f'{_time.time() - _t0:.1f}s', flush=True)
        pending.append((results, rows, B, K, tmap))
    from ..parallel.distributed import fetch
    if _timing:
        _t0 = _time.time()
    task_alns = {}   # (prow, col) -> (n, 6) int32 records
    saturated = []   # pairs whose per-pair record cap (MAXSEG) filled up
    for results, rows, B, K, tmap in pending:   # transfers post-dispatch
        if keep_alignments:
            flat = np.concatenate(
                [fetch(r[0]).reshape(-1, K, 3) for r in results])
            recs = np.concatenate(
                [np.asarray(fetch(r[1])).reshape(-1, K,
                                                 *r[1].shape[2:])
                 for r in results])
        else:
            if _timing:
                fl = []
                for ri_, r in enumerate(results):
                    _tf = _time.time()
                    fl.append(fetch(r).reshape(-1, K, 3))
                    print(f'[timing]   fetch item {ri_}: '
                          f'{_time.time() - _tf:.1f}s', flush=True)
                flat = np.concatenate(fl)
            else:
                flat = np.concatenate(
                    [fetch(r).reshape(-1, K, 3) for r in results])
        t_w, t_i_, t_prow, t_col = tmap
        out.reshape(-1, 2, 3)[t_prow, t_col // 3] = flat[t_w, t_i_]
        if keep_alignments:
            for w, ti, prow, col in zip(t_w, t_i_, t_prow, t_col):
                rr = recs[w, ti]
                task_alns[(int(prow), int(col))] = rr[rr[:, 0] >= 0]
                if rr[-1, 0] >= 0:
                    saturated.append(tuple(pairs[prow]))
    if _timing:
        print(f'[timing] fetch loop: {_time.time() - _t0:.1f}s', flush=True)
    if not keep_alignments:
        return out
    if saturated:
        # Aggregates (num_alns etc.) stay exact; only the emitted rows are
        # capped, so the row count can silently disagree with num_alns for
        # segment-heavy pairs. Surface that instead of burying it in docs.
        from ..utils.logging import get_logger
        get_logger().warning(
            f'{len(saturated)} directed pair(s) hit the per-pair alignment '
            f'record cap; their --out-aln rows are truncated (aggregates '
            f'remain exact). Affected id pairs: '
            + ', '.join(f'({i},{j})' for i, j in saturated[:8])
            + ('...' if len(saturated) > 8 else ''))
    counts = np.zeros(2 * len(pairs), dtype=np.int64)
    blocks = []
    for prow in range(len(pairs)):
        for d, col in enumerate((0, 3)):
            blk = task_alns.get((prow, col))
            if blk is None:
                blk = np.empty((0, 6), np.int32)
            counts[2 * prow + d] = len(blk)
            blocks.append(blk)
    aln_rows = (np.concatenate(blocks) if blocks
                else np.empty((0, 6), np.int32))
    return out, (aln_rows, counts)
