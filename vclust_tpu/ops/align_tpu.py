"""TPU-native batched aligner: the `engine='tpu'` align path.

A from-scratch, massively parallel reformulation of the LZ-ANI alignment
stage (reference contract vclust.py:1058-1181; measure semantics
SURVEY.md section 2.5.3) designed for the TPU's vector units rather than a
translation of the sequential greedy parse. Everything on the hot path is
elementwise / cumulative-scan / gather — no scatters, no per-pair sorts,
no data-dependent shapes:

  1. **Per-genome index (once, not per pair)**: k-mer value arrays and, per
     strand, position lists sorted by k-mer value. Reused across every pair
     the genome participates in.
  2. **Seed join**: each query k-mer locates its reference occurrences with
     a vectorized ``searchsorted`` into the presorted index (capped at
     B_CAND).
  3. **Anchor rail**: positions whose k-mer occurs exactly once in the
     reference are anchors; an anchor is *confirmed* when a same-strand
     anchor nearby sits on a consistent diagonal. Confirmed anchors are
     forward/backward-filled into a per-position target diagonal + strand —
     the vectorized counterpart of the greedy parse's continuation window.
  4. **Candidate pick**: each position keeps the candidate nearest its
     target diagonal (within a tolerance), which resolves repeats and
     duplications the way longest-extension + seed-window linking does.
  5. **Raster**: chosen (strand, diagonal) propagates to unseeded positions
     within `mqd` reach; one gather evaluates per-position base matches on
     the local diagonal (the counterpart of exact/approx extension and gap
     accounting).
  6. **Regions**: covered spans split at strand changes and diagonal jumps
     > mrd; per-region span/match aggregates come from segmented-scan
     identities over cumsum/cummax (region ends read running sums against
     forward-filled values at region starts) — no segment_sum scatters.

Semantics vs the exact engines (`native`/`py`, bit-identical to each
other): same region structure and match counts up to boundary effects of
approximate extension (no `aw`/`am` windowed overshoot past the outermost
seeds; `ar`-run trimming approximated by trimming to outermost matched
positions). Accuracy is pinned by tests/test_align_tpu.py against the
reference's own accuracy contract (tANI within ±0.007 of simulated ground
truth, reference test.py:456-477). Use `tpu` for throughput at scale; use
`native` for golden-parity output (per-alignment rows, exact boundaries).
"""

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lz_parse_py import AlignParams

B_CAND = 8          # candidate reference positions kept per query position
ANCH_REACH = 256    # max distance between mutually confirming anchors
ANCH_DIAG = 64      # max diagonal drift between confirming anchors
SEL_DIAG = 40       # candidate acceptance: |diag - target| <= SEL_DIAG
LEN_QUANT = 16384   # padded-length bucket quantum
BATCH = 32          # directed pairs per device program invocation
BIG = np.int32(2 ** 30)


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
    """Index of the most recent True at or before each position (-BIG if
    none)."""
    return jax.lax.cummax(jnp.where(flag, iota, -BIG))


def _bfill_idx(flag: jnp.ndarray, iota: jnp.ndarray) -> jnp.ndarray:
    """Index of the nearest True at or after each position (BIG if none)."""
    return -jax.lax.cummax(jnp.where(flag, -iota, -BIG), reverse=True)


def _shift_right(x: jnp.ndarray, fill) -> jnp.ndarray:
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def _strand_candidates(qv, sv, spos, iota):
    """Seed join for one strand: per-position candidate diagonals.

    Returns (diag[L,B], valid[L,B], cnt[L], uniq_diag[L])."""
    lo = jnp.searchsorted(sv, qv, side='left')
    hi = jnp.searchsorted(sv, qv, side='right')
    cnt = jnp.where(qv >= 0, hi - lo, 0)
    take = lo[:, None] + jnp.arange(B_CAND)[None, :]
    valid = (take < hi[:, None]) & (cnt > 0)[:, None]
    rpos = spos[jnp.clip(take, 0, spos.shape[0] - 1)]
    diag = jnp.where(valid, rpos - iota[:, None], BIG)
    uniq_diag = jnp.where(cnt == 1, diag[:, 0], BIG)
    return diag, valid, cnt, uniq_diag


def _confirmed_anchors(uniq_diag, iota):
    """Anchors (unique-k-mer seeds) confirmed by a nearby same-strand
    anchor on a consistent diagonal."""
    uniq = uniq_diag < BIG
    d = jnp.where(uniq, uniq_diag, 0)
    p_idx = _shift_right(_ffill_idx(uniq, iota), -BIG)
    n_idx = jnp.flip(_shift_right(jnp.flip(
        _ffill_idx(jnp.flip(uniq), iota), 0), -BIG), 0)
    n_idx = jnp.where(n_idx > -BIG, iota[-1] - n_idx, BIG)
    p_ok = p_idx > -BIG
    n_ok = n_idx < BIG
    p_d = d[jnp.clip(p_idx, 0, None)]
    n_d = d[jnp.clip(n_idx, None, iota.shape[0] - 1)]
    conf_p = p_ok & (iota - p_idx <= ANCH_REACH) & \
        (jnp.abs(uniq_diag - p_d) <= ANCH_DIAG)
    conf_n = n_ok & (n_idx - iota <= ANCH_REACH) & \
        (jnp.abs(uniq_diag - n_d) <= ANCH_DIAG)
    return uniq & (conf_p | conf_n)


@partial(jax.jit, static_argnames=('k', 'mqd', 'mrd', 'reg'))
def _pair_direction(q, qv, qlen, r_fwd, r_rc,
                    sv_f, spos_f, sv_r, spos_r, rlen,
                    *, k, mqd, mrd, reg):
    """Aggregates (n_alns, sum_match, sum_alnlen) for one directed pair."""
    Lq = q.shape[0]
    Lr = r_fwd.shape[0]
    iota = jnp.arange(Lq, dtype=jnp.int32)

    diag_f, val_f, _cf, ud_f = _strand_candidates(qv, sv_f, spos_f, iota)
    diag_r, val_r, _cr, ud_r = _strand_candidates(qv, sv_r, spos_r, iota)
    anch_f = _confirmed_anchors(ud_f, iota)
    anch_r = _confirmed_anchors(ud_r, iota)

    # Target rail: nearest confirmed anchor (either side, either strand)
    # gives each position its expected (strand, diagonal).
    anch = anch_f | anch_r
    a_s = anch_r & ~anch_f   # prefer forward on the (rare) double hit
    a_d = jnp.where(a_s, ud_r, ud_f)
    a_d = jnp.where(anch, a_d, 0)
    p_idx = _ffill_idx(anch, iota)
    n_idx = _bfill_idx(anch, iota)
    use_p = (p_idx > -BIG) & ((n_idx >= BIG) | (iota - p_idx <= n_idx - iota))
    t_idx = jnp.where(use_p, p_idx, n_idx)
    has_t = (p_idx > -BIG) | (n_idx < BIG)
    t_idx_c = jnp.clip(t_idx, 0, Lq - 1)
    T = a_d[t_idx_c]
    TS = a_s[t_idx_c]

    # Candidate pick: nearest candidate to the target diagonal, same strand.
    def pick(diag, valid):
        dist = jnp.where(valid, jnp.abs(diag - T[:, None]), BIG)
        j = jnp.argmin(dist, axis=1)
        dd = jnp.take_along_axis(dist, j[:, None], 1)[:, 0]
        dg = jnp.take_along_axis(diag, j[:, None], 1)[:, 0]
        ok = has_t & (dd <= SEL_DIAG)
        return ok, dg
    ok_f, dg_f = pick(diag_f, val_f)
    ok_r, dg_r = pick(diag_r, val_r)
    hit = jnp.where(TS, ok_r, ok_f)
    hit_diag = jnp.where(TS, dg_r, dg_f)
    hit_strand = TS

    # Median-of-3 over consecutive hit diagonals (same strand): one stray
    # hit on an off diagonal would otherwise split its region twice.
    hp = _shift_right(_ffill_idx(hit, iota), -BIG)
    hn = jnp.flip(_shift_right(jnp.flip(
        _ffill_idx(jnp.flip(hit), iota), 0), -BIG), 0)
    hn = jnp.where(hn > -BIG, iota[-1] - hn, BIG)
    dp = hit_diag[jnp.clip(hp, 0, None)]
    dn = hit_diag[jnp.clip(hn, None, Lq - 1)]
    neigh_ok = (hp > -BIG) & (hn < BIG) & \
        (hit_strand[jnp.clip(hp, 0, None)] == hit_strand) & \
        (hit_strand[jnp.clip(hn, None, Lq - 1)] == hit_strand)
    med = jnp.maximum(jnp.minimum(jnp.maximum(dp, dn), hit_diag),
                      jnp.minimum(dp, dn))
    hit_diag = jnp.where(hit & neigh_ok, med, hit_diag)

    # Raster fill: nearest seeded position on each side (a seed at p
    # supports p..p+k-1 directly; between seeds both sides must be within
    # mqd reach, the factor-linking gap rule).
    h_p = _ffill_idx(hit, iota)
    h_n = _bfill_idx(hit, iota)
    d_prev = jnp.maximum(iota - h_p - (k - 1), 0)
    d_next = jnp.maximum(h_n - iota, 0)
    prev_ok = (h_p > -BIG) & (d_prev <= mqd)
    next_ok = (h_n < BIG) & (d_next <= mqd)
    onseed = (h_p > -BIG) & (iota - h_p <= k - 1)
    covered = ((prev_ok & next_ok) | onseed) & (iota < qlen)
    use_prev = prev_ok & ((~next_ok) | (d_prev <= d_next))
    src = jnp.clip(jnp.where(use_prev, h_p, h_n), 0, Lq - 1)
    D = hit_diag[src]
    S = hit_strand[src]

    # Match raster: q[i] vs r_strand[i + D[i]].
    rj = iota + D
    in_r = (rj >= 0) & (rj < rlen)
    rj_c = jnp.clip(rj, 0, Lr - 1)
    rbase = jnp.where(S, r_rc[rj_c], r_fwd[rj_c])
    m = covered & in_r & (q == rbase) & (q < 4)

    # Regions: split at cover gaps, strand changes, diagonal jumps > mrd.
    prev_cov = _shift_right(covered, False)
    jump = covered & prev_cov & (
        (jnp.abs(D - _shift_right(D, 0)) > mrd)
        | (S != _shift_right(S, False)))
    start = (covered & ~prev_cov) | jump
    nxt_cov = jnp.concatenate([covered[1:], jnp.zeros(1, jnp.bool_)])
    nxt_start = jnp.concatenate([start[1:], jnp.zeros(1, jnp.bool_)])
    end = covered & (nxt_start | ~nxt_cov)

    # Segmented aggregates via scan identities (labels are monotone, so
    # forward-filled start values + running sums give per-region totals at
    # region ends without any scatter).
    mi = m.astype(jnp.int32)
    cs = jnp.cumsum(mi)
    start_idx = _ffill_idx(start, iota)
    base = jax.lax.cummax(jnp.where(start, cs - mi, -1))
    lastm = _ffill_idx(m, iota)
    lastm_before = _shift_right(lastm, -BIG)
    is_first = m & (lastm_before < start_idx)
    firstm = _ffill_idx(is_first, iota)
    matches = cs - base
    span = lastm - firstm + 1
    valid = end & (lastm >= start_idx) & (firstm >= start_idx) & \
        (span >= reg)
    n_alns = jnp.sum(valid.astype(jnp.int32))
    sum_match = jnp.sum(jnp.where(valid, matches, 0))
    sum_alnlen = jnp.sum(jnp.where(valid, span, 0))
    return n_alns, sum_match, sum_alnlen


@partial(jax.jit, static_argnames=('k', 'mqd', 'mrd', 'reg'))
def _group_run(bq_fwd, bq_qv, br_fwd, br_rc, br_sv_f, br_spos_f,
               br_sv_r, br_spos_r, q_rows, r_rows, qlens, rlens,
               *, k, mqd, mrd, reg):
    """Run all chunks of one (q-bucket, r-bucket) task group in a single
    device program: lax.map over chunks, vmap over the tasks of a chunk.
    Rows/lens are (n_chunks, BATCH); returns (n_chunks, BATCH, 3)."""
    pair = partial(_pair_direction, k=k, mqd=mqd, mrd=mrd, reg=reg)

    def chunk(args):
        qr, rr, ql, rl = args
        n, sm, sl = jax.vmap(pair)(
            bq_fwd[qr], bq_qv[qr], ql, br_fwd[rr], br_rc[rr],
            br_sv_f[rr], br_spos_f[rr], br_sv_r[rr], br_spos_r[rr], rl)
        return jnp.stack([n, sm, sl], axis=-1)

    return jax.lax.map(chunk, (q_rows, r_rows, qlens, rlens))


def _pad_bucket(n: int) -> int:
    return max(LEN_QUANT, -(-n // LEN_QUANT) * LEN_QUANT)


class GenomeIndexTPU:
    """Device-resident per-bucket genome arena: padded codes (both strands),
    k-mer values, and per-strand k-mer-sorted position lists."""

    def __init__(self, codes_list: Sequence[np.ndarray], k: int):
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
            kv = jax.jit(jax.vmap(partial(kmer_vals, k=k)))
            qv_f = kv(fwd_d)
            qv_r = kv(rc_d)
            order_f = jnp.argsort(qv_f, axis=1)
            order_r = jnp.argsort(qv_r, axis=1)
            self.bucket[Lp] = dict(
                fwd=fwd_d, rc=rc_d, qv=qv_f,
                sv_f=jnp.take_along_axis(qv_f, order_f, 1),
                spos_f=order_f.astype(jnp.int32),
                sv_r=jnp.take_along_axis(qv_r, order_r, 1),
                spos_r=order_r.astype(jnp.int32),
            )


def all2all_tpu(codes_list: Sequence[np.ndarray], pairs: np.ndarray,
                params: Optional[AlignParams] = None,
                index: Optional[GenomeIndexTPU] = None) -> np.ndarray:
    """All-vs-all aggregates on TPU for unordered candidate `pairs` over
    ids-ordered genomes. Returns int64 array (len(pairs), 6) with columns
    (n_ji, match_ji, alnlen_ji, n_ij, match_ij, alnlen_ij), the same layout
    as lz_native.all2all_native's aggregate output."""
    params = params or AlignParams()
    k, mqd, mrd, reg = params.mal, params.mqd, params.mrd, params.reg
    idx = index or GenomeIndexTPU(codes_list, k)
    lens = idx.lens

    # Directed tasks (qidx, ridx, pair_row, out_col), grouped by bucket
    # shape so each group runs one compiled program.
    groups: Dict[Tuple[int, int], List] = {}
    for row, (i, j) in enumerate(pairs):
        i, j = int(i), int(j)
        for (qi, ri, col) in ((j, i, 0), (i, j, 3)):
            kq, kr = _pad_bucket(lens[qi]), _pad_bucket(lens[ri])
            groups.setdefault((kq, kr), []).append((qi, ri, row, col))

    out = np.zeros((len(pairs), 6), dtype=np.int64)
    pending = []   # (device result, task list)
    for (kq, kr), ts in sorted(groups.items()):
        bq, br = idx.bucket[kq], idx.bucket[kr]
        n_chunks = -(-len(ts) // BATCH)
        # Pad chunk count to a power of two to bound compile variants.
        n_chunks_p = 1 << (n_chunks - 1).bit_length()
        n_pad = n_chunks_p * BATCH
        q_rows = np.zeros(n_pad, np.int32)
        r_rows = np.zeros(n_pad, np.int32)
        qlens = np.zeros(n_pad, np.int32)
        rlens = np.zeros(n_pad, np.int32)
        for t_i, (qi, ri, _row, _col) in enumerate(ts):
            q_rows[t_i] = idx.row[qi]
            r_rows[t_i] = idx.row[ri]
            qlens[t_i] = lens[qi]
            rlens[t_i] = lens[ri]
        shape = (n_chunks_p, BATCH)
        res = _group_run(
            bq['fwd'], bq['qv'], br['fwd'], br['rc'],
            br['sv_f'], br['spos_f'], br['sv_r'], br['spos_r'],
            jnp.asarray(q_rows.reshape(shape)),
            jnp.asarray(r_rows.reshape(shape)),
            jnp.asarray(qlens.reshape(shape)),
            jnp.asarray(rlens.reshape(shape)),
            k=k, mqd=mqd, mrd=mrd, reg=reg)
        pending.append((res, ts))
    for res, ts in pending:   # one transfer per group, post-dispatch
        flat = np.asarray(res).reshape(-1, 3)
        for t_i, (qi, ri, row, col) in enumerate(ts):
            out[row, col:col + 3] = flat[t_i]
    return out
