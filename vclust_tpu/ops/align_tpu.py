"""TPU-native batched aligner: the `engine='tpu'` align path.

A from-scratch, massively parallel reformulation of the LZ-ANI alignment
stage (reference contract vclust.py:1058-1181; measure semantics
SURVEY.md section 2.5.3), designed for the TPU's vector units rather than
a translation of the sequential greedy parse. The per-pair work is a fixed
dataflow of gathers, sorts and scans over static shapes — no data-dependent
control flow, so XLA compiles one program per length-bucket combination and
thousands of directed pairs run per dispatch:

  1. **Per-genome device index (once, not per pair)**: seed-k-mer value per
     position, plus per-strand (value-sorted values, positions) arrays for
     the reference role. Reused across every pair the genome joins.
  2. **Seed votes**: every STRIDE-th query position looks up its seed k-mer
     in the reference's sorted array (vectorized searchsorted + bounded
     take) and emits up to CANDS candidate diagonals per strand.
  3. **Block diagonal clustering**: votes are grouped into query blocks of
     BLOCK positions; per block, the densest diagonal cluster (votes within
     GAP_DIAG of each other, found by a sort + windowed rank count) elects
     the block's (strand, diagonal). This is the vectorized counterpart of
     the greedy parse's anchor selection + seed-window linking.
  4. **Match evaluation**: every position compares its query base against
     the reference base on its block's diagonal; where consecutive blocks
     elect different diagonals, the optimal single switch point inside the
     block is found by a prefix-sum argmax (the vectorized counterpart of
     factor linking around an indel).
  5. **Region segmentation**: matches are cut into regions at query gaps
     > mqd and at block-level diagonal jumps > mrd / strand changes (the
     factor-linking limits); regions are trimmed to their outermost matches
     and dropped when shorter than `reg`. Aggregates (n_alns, sum_match,
     sum_alnlen) come from cumulative-scan identities, no scatters.

Semantics vs the exact engines (`native`/`py`, which are bit-identical to
each other): same measures up to block-granularity approximations of
anchor choice and approximate-extension boundaries. Accuracy is pinned by
tests/test_align_tpu.py: tANI within the reference's own accuracy contract
(±0.007 of simulated ground truth, reference test.py:456-477) and within a
small tolerance of the exact engine on every golden pair. Use `tpu` for
throughput at scale; use `native` for golden-parity per-alignment output.
"""

from functools import lru_cache, partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lz_parse_py import AlignParams
from ..utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

SEED_K = 9          # seed length for diagonal votes (TPU path)
STRIDE = 1          # query positions between consecutive seed lookups
CANDS = 2           # candidate reference positions kept per seed (the
#                     newest two occurrences; the block election makes
#                     repeat resolution robust to the small candidate set)
BLOCK = 128         # coarse block width = diagonal election granularity
FINE = 32           # fine block width (rearrangement-boundary resolution)
GAP_DIAG = 16       # max diagonal spread within one vote cluster
SMAX = 15           # cluster-count saturation (ranking needs no more)
MIN_VOTES = 5       # votes needed for a block to elect a diagonal
MSL = 7             # consecutive matches forming a seed run (chains)
MAL = 11            # consecutive matches able to OPEN a region
AW = 39             # max distance from a seed run for a match to chain
AW_WIN = 15         # approximate-extension window length (density rule)
AM = 7              # max mismatches tolerated inside the window
BATCH = 16          # directed pairs per vmapped chunk at the largest
#                     buckets; small buckets batch more (see _batch_for) so
#                     dispatch overhead amortizes


def _batch_for(Lq: int, Lr: int) -> int:
    """Pairs per dispatch: ~2M padded query bases per chunk, so device
    work per dispatch stays >> launch overhead at every bucket size."""
    return max(16, min(512, (1 << 21) // max(Lq, Lr)))
BIG = np.int32(2 ** 30)

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


def _ffill_idx(flag: jnp.ndarray, iota: jnp.ndarray) -> jnp.ndarray:
    """Index of the most recent True at or before each position (-1 if
    none)."""
    return jax.lax.cummax(jnp.where(flag, iota, -1))


def _shift_right(x: jnp.ndarray, fill) -> jnp.ndarray:
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def _pair_core(q_fwd, qv, qlen, r_fwd, r_rc,
               sv_f, spos_f, sv_r, spos_r, rlen,
               *, Lq, Lr, mqd, mrd, reg, debug=False):
    """Aggregates (n_alns, sum_match, sum_alnlen) for one directed pair."""
    Ls = Lq // STRIDE
    DSPAN = Lq + Lr + 64
    iota = jnp.arange(Lq, dtype=jnp.int32)

    # --- 1. seed votes via sort-merge join -------------------------------
    # Binary search (searchsorted) is an iterated gather and runs ~100x
    # slower than a sort on TPU, so query seeds are joined to the
    # reference's presorted seed array by a merge: sort the concatenation
    # (reference entries before query entries on equal values), read off
    # each query entry's reference rank with a cumulative sum, and gather
    # the top CANDS candidate positions directly from the presorted
    # reference arrays.
    qpos_s = jnp.arange(Ls, dtype=jnp.int32) * STRIDE
    qs = qv[::STRIDE]
    qs_ok = (qs >= 0) & (qpos_s < qlen)
    qs_key = jnp.where(qs_ok, qs, -2)   # -2 matches nothing

    def strand_votes(sv, spos, offset):
        # Cap sentinel values so doubling cannot overflow int32.
        keys = jnp.concatenate(
            [jnp.minimum(sv, BIG // 4) * 2, qs_key * 2 + 1])
        payload = jnp.concatenate(
            [jnp.arange(Lr, dtype=jnp.int32),
             Lr + jnp.arange(Ls, dtype=jnp.int32)])
        skeys, spayload = jax.lax.sort((keys, payload), num_keys=1)
        is_q = spayload >= Lr
        rank = jnp.cumsum((~is_q).astype(jnp.int32))   # refs at or before
        # Compact query slots back to seed order: one more sort.
        key2 = jnp.where(is_q, spayload - Lr, BIG)
        _, rank_q = jax.lax.sort((key2, rank), num_keys=1)
        rank_q = rank_q[:Ls]
        cands = []
        for c in range(CANDS):
            idx = rank_q - 1 - c
            okc = idx >= 0
            idx_c = jnp.clip(idx, 0, Lr - 1)
            okc &= sv[idx_c] == qs_key
            rpos = spos[idx_c]
            okc &= (rpos < rlen) & qs_ok
            cands.append(jnp.where(okc, rpos - qpos_s + Lq + offset, BIG))
        return jnp.stack(cands, axis=1)

    votes = jnp.concatenate(
        [strand_votes(sv_f, spos_f, 0),
         strand_votes(sv_r, spos_r, DSPAN)], axis=1)   # (Ls, 2*CANDS)

    # --- 2. two-scale block diagonal election ---------------------------
    # Coarse blocks (BLOCK wide) are robust on sparse votes; fine blocks
    # (FINE wide) resolve rearrangement boundaries and dense indels; a
    # fine block without a strong enough cluster inherits its coarse
    # block's choice.
    def elect(nb, cstride=1):
        # Densest-cluster election per block. Counting "votes within
        # GAP_DIAG above mine" uses static shifted compares on the sorted
        # row (no binary search); counts saturate at SMAX per counted
        # element, so the coarse scale counts a cstride-subsample of the
        # sorted row to keep large clusters distinguishable at the same
        # cost.
        vpb = (Lq // nb // STRIDE) * 2 * CANDS
        sd = jnp.sort(votes.reshape(nb, vpb), axis=1)
        sds = sd[:, ::cstride]
        w = sds.shape[1]
        smax = min(SMAX, w - 1)
        pad = jnp.full((nb, smax), BIG, jnp.int32)
        sdp = jnp.concatenate([sds, pad], axis=1)
        cnt = jnp.ones((nb, w), jnp.int32)
        for s in range(1, smax + 1):
            cnt = cnt + (sdp[:, s:w + s] - sds <= GAP_DIAG)
        cnt = jnp.where(sds < BIG, cnt, 0)
        j0 = jnp.argmax(cnt, axis=1)
        vb = jnp.take_along_axis(cnt, j0[:, None], 1)[:, 0]
        med_idx = jnp.clip(j0 + vb // 2, 0, w - 1)
        medv = jnp.take_along_axis(sds, med_idx[:, None], 1)[:, 0]
        strand = medv >= DSPAN
        diag = jnp.where(strand, medv - DSPAN, medv) - Lq
        # Exact (unsaturated) vote count of the elected cluster, so
        # MIN_VOTES thresholds real votes regardless of cstride/SMAX.
        # A block with no valid votes elects the BIG sentinel; zero it.
        vb_x = jnp.sum((jnp.abs(sd - medv[:, None]) <= GAP_DIAG)
                       .astype(jnp.int32), axis=1)
        vb_x = jnp.where(medv < BIG, vb_x, 0)
        return vb_x, strand, diag, medv, sd

    NBC = Lq // BLOCK
    NBF = Lq // FINE
    RATIO = BLOCK // FINE
    vb_c, S_c, D_c, medv_c, _ = elect(NBC, cstride=4)
    vb_f, S_f, D_f, _, sd_f = elect(NBF)
    A_c = vb_c >= MIN_VOTES
    # Fine override needs to strictly beat the fine-block vote support for
    # the coarse diagonal; otherwise repeats (which support two clusters
    # equally) would be resolved against the surrounding context.
    center = jnp.repeat(medv_c, RATIO)
    sup_c = jnp.sum(
        (jnp.abs(sd_f - center[:, None]) <= GAP_DIAG).astype(jnp.int32),
        axis=1)
    A_cf = jnp.repeat(A_c, RATIO)
    use_f = (vb_f >= MIN_VOTES) & (~A_cf | (vb_f > sup_c))
    A = use_f | A_cf
    S = jnp.where(use_f, S_f, jnp.repeat(S_c, RATIO))
    D = jnp.where(use_f, D_f, jnp.repeat(D_c, RATIO))
    vb = jnp.where(use_f, vb_f, jnp.repeat(vb_c, RATIO))

    Ap = jnp.concatenate([jnp.zeros(1, jnp.bool_), A[:-1]])
    Sp = jnp.concatenate([jnp.zeros(1, jnp.bool_), S[:-1]])
    Dp = jnp.concatenate([jnp.zeros(1, jnp.int32), D[:-1]])

    # --- 3. per-position match flags with single-switch refinement ------
    def eval_on(D_b, S_b, ok_b):
        Dq = jnp.repeat(D_b, FINE)
        Sq = jnp.repeat(S_b, FINE)
        okq = jnp.repeat(ok_b, FINE)
        rj = iota + Dq
        ok = okq & (rj >= 0) & (rj < rlen) & (iota < qlen)
        rj_c = jnp.clip(rj, 0, Lr - 1)
        rb = jnp.where(Sq, r_rc[rj_c], r_fwd[rj_c])
        return ok & (q_fwd == rb) & (q_fwd < 4)

    switchable = A & Ap & ((D != Dp) | (S != Sp))
    m1 = eval_on(D, S, A)
    m0 = eval_on(Dp, Sp, switchable)
    m0b = m0.reshape(NBF, FINE).astype(jnp.int32)
    m1b = m1.reshape(NBF, FINE).astype(jnp.int32)
    g = jnp.cumsum(m0b - m1b, axis=1)
    gpad = jnp.concatenate([jnp.zeros((NBF, 1), jnp.int32), g], axis=1)
    tstar = jnp.argmax(gpad, axis=1).astype(jnp.int32)     # 0..FINE
    tstar = jnp.where(switchable, tstar, 0)
    posb = jnp.arange(FINE, dtype=jnp.int32)[None, :]
    mb = jnp.where(posb < tstar[:, None], m0b, m1b)
    m = mb.reshape(Lq).astype(jnp.bool_)

    # --- 4. region breaks ------------------------------------------------
    # Unlinked adjacent assigned blocks break at the switch point (the
    # factor-linking limits: same strand, |diagonal jump| <= mrd).
    linked = A & Ap & (S == Sp) & (jnp.abs(D - Dp) <= mrd)
    brk_blk = (A & Ap & ~linked
               & (jnp.arange(NBF, dtype=jnp.int32) > 0))
    Bb = brk_blk[:, None] & (posb == jnp.minimum(tstar, FINE - 1)[:, None])
    B = Bb.reshape(Lq).astype(jnp.int32)

    # --- 5. anchored matches ---------------------------------------------
    # The greedy parse only opens/continues factors at exact seed matches
    # (>= msl consecutive matching bases); scattered single matches are
    # credited only when near a factor (gap credit / approx extension).
    # Raster analog: a match may delimit a segment only when within AW of
    # a >= MSL consecutive-match run; other matches still count toward
    # nt_match inside the segment but cannot extend or chain it.
    last_mm = _ffill_idx(~m, iota)
    run_end = iota - last_mm                  # run length ending at i
    rev_mm = jax.lax.cummax(
        jnp.where(~m, -iota, -BIG), reverse=True)
    next_mm = jnp.where(rev_mm > -BIG, -rev_mm, Lq)
    run_fwd = next_mm - iota                  # run length starting at i
    runlen = run_end + run_fwd - 1
    in_run = m & (runlen >= MSL)
    in_anchor = m & (runlen >= MAL)   # long enough to OPEN a region
    pe = _ffill_idx(in_run, iota)
    ne_neg = jax.lax.cummax(jnp.where(in_run, -iota, -BIG), reverse=True)
    ne = jnp.where(ne_neg > -BIG, -ne_neg, Lq + AW + 1)
    dist = jnp.minimum(jnp.where(pe >= 0, iota - pe, Lq), ne - iota)
    # Density pass: the approximate-extension window rule (<= AM
    # mismatches per AW_WIN positions) as a raster predicate — a match
    # chains only if some AW_WIN-window covering it is dense enough.
    # Random 25%-identity terrain fails this almost everywhere.
    mi32 = m.astype(jnp.int32)
    csm = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(mi32)])
    d_win = csm[iota + 1] - csm[jnp.maximum(iota + 1 - AW_WIN, 0)]
    dense_end = d_win >= (AW_WIN - AM)
    cf = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(dense_end.astype(jnp.int32))])
    covered_by_dense = (cf[jnp.minimum(iota + AW_WIN, Lq)] - cf[iota]) > 0
    ma = m & (dist <= AW) & (covered_by_dense | in_run)

    # --- 6. segmentation + aggregates ------------------------------------
    pm = _ffill_idx(ma, iota)                # last anchor at or before i
    pm_excl = _shift_right(pm, jnp.int32(-1))
    cumB = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(B)])
    crossed = cumB[iota + 1] - cumB[jnp.clip(pm_excl, -1, Lq - 1) + 1] > 0
    seg_start = ma & ((pm_excl < 0) | (iota - pm_excl - 1 > mqd) | crossed)

    # Next segment start strictly after i (Lq if none): smallest index >= i
    # with seg_start, via a reversed cummax over negated indices.
    neg = jax.lax.cummax(jnp.where(seg_start, -iota, -BIG), reverse=True)
    nx = jnp.where(neg > -BIG, -neg, Lq)
    ns_after = jnp.concatenate([nx[1:], jnp.full((1,), Lq, jnp.int32)])

    cs = jnp.cumsum(m.astype(jnp.int32))
    e_i = pm[jnp.clip(ns_after - 1, 0, Lq - 1)]   # last match of my segment
    span = e_i - iota + 1
    matches = cs[jnp.clip(e_i, 0, Lq - 1)] - cs[iota] + 1
    # A region must contain an opening anchor (>= MAL-run), mirroring the
    # greedy parse's mal-length region-opening requirement.
    c11 = jnp.cumsum(in_anchor.astype(jnp.int32))
    has_anchor = (c11[jnp.clip(e_i, 0, Lq - 1)] - c11[iota]
                  + in_anchor[iota].astype(jnp.int32)) > 0
    acc = seg_start & (span >= reg) & has_anchor
    n_alns = jnp.sum(acc.astype(jnp.int32))
    sum_match = jnp.sum(jnp.where(acc, matches, 0))
    sum_alnlen = jnp.sum(jnp.where(acc, span, 0))
    if debug:
        s_i = _ffill_idx(seg_start, iota)
        s_c = jnp.clip(s_i, 0, Lq - 1)
        acc_cov = (s_i >= 0) & acc[s_c] & (iota <= e_i[s_c])
        return dict(m=m, acc_cov=acc_cov, D=D, S=S, A=A, vb=vb,
                    seg_start=seg_start, tstar=tstar,
                    n_alns=n_alns, sum_match=sum_match,
                    sum_alnlen=sum_alnlen)
    return n_alns, sum_match, sum_alnlen


_pair_direction = jax.jit(_pair_core, static_argnames=(
    'Lq', 'Lr', 'mqd', 'mrd', 'reg', 'debug'))


def _pair_direction_debug(*args, **kwargs):
    return _pair_direction(*args, **kwargs, debug=True)


def _group_run_body(bq_fwd, bq_qv, br_fwd, br_rc, br_sv_f, br_spos_f,
                    br_sv_r, br_spos_r, q_rows, r_rows, qlens, rlens,
                    *, Lq, Lr, mqd, mrd, reg):
    """Run all chunks of one (q-bucket, r-bucket) task group in a single
    device program: lax.map over chunks, vmap over the tasks of a chunk.
    Rows/lens are (n_chunks, BATCH); returns (n_chunks, BATCH, 3)."""
    pair = partial(_pair_direction, Lq=Lq, Lr=Lr, mqd=mqd, mrd=mrd, reg=reg)

    def chunk(args):
        qr, rr, ql, rl = args
        n, sm, sl = jax.vmap(pair)(
            bq_fwd[qr], bq_qv[qr], ql, br_fwd[rr], br_rc[rr],
            br_sv_f[rr], br_spos_f[rr], br_sv_r[rr], br_spos_r[rr], rl)
        return jnp.stack([n, sm, sl], axis=-1)

    return jax.lax.map(chunk, (q_rows, r_rows, qlens, rlens))


_group_run = jax.jit(_group_run_body, static_argnames=(
    'Lq', 'Lr', 'mqd', 'mrd', 'reg'))


@lru_cache(maxsize=128)
def _make_sharded_group_run(mesh, Lq, Lr, mqd, mrd, reg):
    """Pair-grid data parallelism over the mesh: the chunk axis of one
    bucket-combination group is sharded across devices; the genome arena
    is replicated (the sketch-allgather design of SURVEY.md section 7 —
    pair tiles ride ICI-free, each device runs its chunk slice)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    body = partial(_group_run_body, Lq=Lq, Lr=Lr, mqd=mqd, mrd=mrd, reg=reg)
    rep = (P(),) * 8
    sharded = (P(axis, None),) * 4
    return jax.jit(shard_map(
        body, mesh=mesh, in_specs=rep + sharded,
        out_specs=P(axis, None, None)))


@partial(jax.jit, static_argnames=('k',))
def _index_block(fwd, rc, k: int):
    kv = jax.vmap(partial(kmer_vals, k=k))
    qv = kv(fwd)
    vr = kv(rc)
    vf_s = jnp.where(qv < 0, BIG, qv)
    vr_s = jnp.where(vr < 0, BIG, vr)
    order_f = jnp.argsort(vf_s, axis=1).astype(jnp.int32)
    order_r = jnp.argsort(vr_s, axis=1).astype(jnp.int32)
    return (qv,
            jnp.take_along_axis(vf_s, order_f, 1), order_f,
            jnp.take_along_axis(vr_s, order_r, 1), order_r)


class GenomeIndexTPU:
    """Device-resident per-bucket genome arena: padded codes (both
    strands), per-position seed k-mer values, and per-strand value-sorted
    (values, positions) arrays. Built once; reused across all pairs."""

    def __init__(self, codes_list: Sequence[np.ndarray], k: int = SEED_K,
                 rows_chunk: int = 512):
        from ..core.seq import revcomp_codes
        self.k = k
        self.lens = np.array([len(c) for c in codes_list], dtype=np.int32)
        self.bucket = {}   # Lp -> dict of stacked device arrays
        self.row = {}      # genome idx -> row within its bucket
        members: Dict[int, List[int]] = {}
        for i, c in enumerate(codes_list):
            members.setdefault(_pad_bucket(len(c)), []).append(i)
        for Lp, idxs in members.items():
            G = len(idxs)
            fwd = np.full((G, Lp), 4, dtype=np.int8)
            rc = np.full((G, Lp), 4, dtype=np.int8)
            for row, i in enumerate(idxs):
                fwd[row, :self.lens[i]] = codes_list[i]
                rc[row, :self.lens[i]] = revcomp_codes(codes_list[i])
                self.row[i] = row
            fwd_d = jnp.asarray(fwd)
            rc_d = jnp.asarray(rc)
            parts = []
            for lo in range(0, G, rows_chunk):
                parts.append(_index_block(fwd_d[lo:lo + rows_chunk],
                                          rc_d[lo:lo + rows_chunk], k))
            qv, sv_f, spos_f, sv_r, spos_r = (
                jnp.concatenate(xs, axis=0) if len(xs) > 1 else xs[0]
                for xs in zip(*parts))
            self.bucket[Lp] = dict(
                fwd=fwd_d, rc=rc_d, qv=qv, sv_f=sv_f, spos_f=spos_f,
                sv_r=sv_r, spos_r=spos_r)


def all2all_tpu(codes_list: Sequence[np.ndarray], pairs: np.ndarray,
                params: Optional[AlignParams] = None,
                index: Optional[GenomeIndexTPU] = None,
                mesh=None) -> np.ndarray:
    """All-vs-all aggregates on TPU for unordered candidate `pairs` over
    ids-ordered genomes. Returns int64 array (len(pairs), 6) with columns
    (n_ji, match_ji, alnlen_ji, n_ij, match_ij, alnlen_ij), the same layout
    as lz_native.all2all_native's aggregate output. With `mesh`, each
    group's chunk axis is sharded over the mesh devices."""
    params = params or AlignParams()
    mqd, mrd, reg = params.mqd, params.mrd, params.reg
    idx = index or GenomeIndexTPU(codes_list)
    lens = idx.lens
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev <= 1:
        mesh = None

    # Directed tasks (qidx, ridx, pair_row, out_col), grouped by bucket
    # combination so each group runs one compiled program.
    groups: Dict[Tuple[int, int], List] = {}
    for row, (i, j) in enumerate(pairs):
        i, j = int(i), int(j)
        for (qi, ri, col) in ((j, i, 0), (i, j, 3)):
            kq, kr = _pad_bucket(lens[qi]), _pad_bucket(lens[ri])
            groups.setdefault((kq, kr), []).append((qi, ri, row, col))

    out = np.zeros((len(pairs), 6), dtype=np.int64)
    pending = []   # (device results, task list)
    # Fixed dispatch shape (chunk_rows, BATCH): ONE compiled program per
    # bucket combination regardless of how many pairs a group has; chunk
    # dispatches queue asynchronously on the device.
    chunk_rows = n_dev if mesh is not None else 1
    for (kq, kr), ts in sorted(groups.items()):
        bq, br = idx.bucket[kq], idx.bucket[kr]
        batch = _batch_for(kq, kr)
        # Tiny groups: don't pad a handful of tasks to a huge chunk (and
        # don't compile one); round the needed size up to a power of two
        # so variant count stays logarithmic.
        need = -(-len(ts) // chunk_rows)
        if need < batch:
            batch = max(16, 1 << (need - 1).bit_length())
        per_dispatch = chunk_rows * batch
        n_disp = -(-len(ts) // per_dispatch)
        n_pad = n_disp * per_dispatch
        q_rows = np.zeros(n_pad, np.int32)
        r_rows = np.zeros(n_pad, np.int32)
        qlens = np.zeros(n_pad, np.int32)
        rlens = np.zeros(n_pad, np.int32)
        for t_i, (qi, ri, _row, _col) in enumerate(ts):
            q_rows[t_i] = idx.row[qi]
            r_rows[t_i] = idx.row[ri]
            qlens[t_i] = lens[qi]
            rlens[t_i] = lens[ri]
        arena = (bq['fwd'], bq['qv'], br['fwd'], br['rc'],
                 br['sv_f'], br['spos_f'], br['sv_r'], br['spos_r'])
        if mesh is not None:
            from ..parallel.distributed import replicate, shard_rows
            run = _make_sharded_group_run(mesh, kq, kr, mqd, mrd, reg)
            arena = tuple(replicate(mesh, a) for a in arena)
            place = partial(shard_rows, mesh)
        else:
            run = partial(_group_run, Lq=kq, Lr=kr, mqd=mqd, mrd=mrd,
                          reg=reg)
            place = jnp.asarray
        results = []
        shape = (chunk_rows, batch)
        for d in range(n_disp):
            lo, hi = d * per_dispatch, (d + 1) * per_dispatch
            results.append(run(
                *arena,
                place(q_rows[lo:hi].reshape(shape)),
                place(r_rows[lo:hi].reshape(shape)),
                place(qlens[lo:hi].reshape(shape)),
                place(rlens[lo:hi].reshape(shape))))
        pending.append((results, ts))
    from ..parallel.distributed import fetch
    for results, ts in pending:   # transfers post-dispatch
        flat = np.concatenate([fetch(r).reshape(-1, 3)
                               for r in results])
        for t_i, (qi, ri, row, col) in enumerate(ts):
            out[row, col:col + 3] = flat[t_i]
    return out
