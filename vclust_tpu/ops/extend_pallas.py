"""Pallas TPU kernel: batched approximate match extension.

The anchor/seed extension loop is the hot core of the LZ aligner (SURVEY.md
section 2.5.5). This kernel runs many extension jobs per launch: each job
starts at query/reference offsets (qi, ri) and extends forward while every
trailing window of `aw` bases has <= `am` mismatches, then trims the result
so it ends with a run of >= `ar` matches — exactly the semantics of
ops/lz_parse_py._extend, reformulated as a single forward scan:

    * scan bases in blocks of SPAN lanes;
    * sliding-window mismatch counts with an (aw-1)-flag carry detect the
      first violation;
    * the rightmost ">= ar match-run end" (cut candidate) and its match
      prefix count are tracked per block, so stopping needs no backtrack.

The oracle's two phases (exact extension, then windowed approx extension
with trim) are equivalent to this single scan: the exact phase contributes
zero mismatch flags (identical window sums) and, being >= ar long, always
contains the same trailing cut candidates. Bit-exact equivalence is pinned
by tests/test_extend_pallas.py.

Backward extension reuses this kernel on host-prepared reversed code
arrays (extension is direction-symmetric).

Status: validated but NOT on the production path, by measurement rather
than neglect. The round-3/4 TPU engine (ops/align_tpu.py) replaced
per-extension jobs with a full-raster evaluation whose fused XLA form
runs at ~0.3 ns/position (tools/microbench_r4.py) — the approximate-
extension window rule became the raster density pass, subsuming this
kernel's job on the TPU path. The host engines cannot feed it either:
the greedy parse is sequential per pair (each extension's result decides
the next seed search), so extension jobs cannot batch within a pair, and
per-job device round trips over this host link cost ~ms against a ~us
C++ inline extension. A kernel-per-fine-block Pallas variant of the
raster eval was also analyzed and rejected: per-block scalar-driven
(1, 64) slices serialize on the VPU, while XLA vectorizes the same
window fetch as one large row gather. The kernel is retained as the
validated Pallas reference for any future design where extension jobs
batch naturally (e.g. a re-anchoring gap parser producing thousands of
independent jobs per dispatch).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SPAN = 1024          # bases scanned per block step
JOBS_BLOCK = 8       # jobs per grid program
MAX_BLOCKS = 256     # max extension length = SPAN * MAX_BLOCKS bases
BIG = np.int32(2**30)
CARRY = 128       # carry lanes between blocks (>= aw-1 and >= ar-1)


def _lane_shift_right(x, s, fill):
    """x shifted right by s lanes (value from lane t-s; first s lanes get
    `fill`). Static s."""
    t = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, shift=s, axis=1)
    return jnp.where(t >= s, rolled, fill)




def _extend_kernel(qi_ref, ri_ref, qlim_ref, rlim_ref, njob_ref,
                   q_ref, r_ref, out_ref, *, aw, am, ar):
    """One grid program: JOBS_BLOCK forward extension jobs against (q, r).

    q_ref/r_ref: (1, L) int32 code arrays (values 0..4; 4 never matches).
    qi/ri: first base offsets to compare. qlim/rlim: sequence lengths
    (exclusive comparison limits). out_ref: (JOBS_BLOCK, 2) int32 SMEM
    holding (total_len, nt_match).
    """
    n_jobs = njob_ref[0, 0]
    b = pl.program_id(0)
    t_local = jax.lax.broadcasted_iota(jnp.int32, (1, SPAN), 1)

    def one_job(j, _):
        @pl.when(b * JOBS_BLOCK + j < n_jobs)
        def _():
            qi = qi_ref[b, j]
            ri = ri_ref[b, j]
            max_len = jnp.minimum(qlim_ref[b, j] - qi, rlim_ref[b, j] - ri)

            def cond(state):
                off, stop = state[0], state[1]
                return jnp.logical_not(stop) & (off < SPAN * MAX_BLOCKS)

            def load_span(ref, start):
                # Unaligned lane reads are unsupported: load an aligned
                # SPAN+128 window and rotate the remainder away.
                aligned = pl.multiple_of((start // 128) * 128, 128)
                rem = start - aligned
                blk = ref[0, pl.ds(aligned, SPAN + 128)].reshape(
                    1, SPAN + 128)
                shift = jnp.where(rem == 0, 0, SPAN + 128 - rem)
                rolled = pltpu.roll(blk, shift, axis=1)
                return rolled[:, :SPAN]

            def body(state):
                (off, _stop, carry_f, carry_m, match_carry, best_cut,
                 best_match) = state
                qb = load_span(q_ref, qi + off)
                rb = load_span(r_ref, ri + off)
                t_abs = off + t_local
                valid = t_abs < max_len
                m = (qb == rb) & (qb < 4) & valid
                f = jnp.where(m, 0, 1).astype(jnp.int32)
                # Window mismatch sums over a carry-extended vector: the
                # previous block's last CARRY flags prefix the current
                # ones, so windows crossing the block boundary are exact.
                g_f = jnp.concatenate([carry_f, f], axis=1)
                w_g = g_f
                for k in range(1, aw):
                    w_g = w_g + _lane_shift_right(g_f, k, 0)
                w = w_g[:, CARRY:]
                viol = w > am
                first_v = jnp.min(jnp.where(viol, t_local, BIG))
                # Cut candidates: positions ending a run of >= ar matches
                # (the pre-extension history counts as matches, which
                # reproduces the oracle's always-consumed exact phase).
                g_m = jnp.concatenate([carry_m, m.astype(jnp.int32)],
                                      axis=1)
                run_ok = g_m
                for k in range(1, ar):
                    run_ok = run_ok * _lane_shift_right(g_m, k, 1)
                ok = (run_ok[:, CARRY:] > 0) & (t_local < first_v) & valid
                cut_t = jnp.max(jnp.where(ok, t_local, -1))
                match_upto_cut = jnp.sum(
                    jnp.where((t_local <= cut_t) & m, 1, 0))
                new_best_cut = jnp.where(cut_t >= 0, off + cut_t + 1,
                                         best_cut)
                new_best_match = jnp.where(cut_t >= 0,
                                           match_carry + match_upto_cut,
                                           best_match)
                stop_now = (first_v < BIG) | (max_len <= off + SPAN)
                new_match_carry = match_carry + jnp.sum(
                    jnp.where(m, 1, 0))
                new_carry_f = g_f[:, SPAN:]
                new_carry_m = g_m[:, SPAN:]
                return (off + SPAN, stop_now, new_carry_f, new_carry_m,
                        new_match_carry, new_best_cut, new_best_match)

            init = (jnp.int32(0), jnp.bool_(False),
                    jnp.zeros((1, CARRY), jnp.int32),
                    jnp.ones((1, CARRY), jnp.int32),
                    jnp.int32(0), jnp.int32(0), jnp.int32(0))
            final = jax.lax.while_loop(cond, body, init)
            out_ref[b, 2 * j] = final[5]
            out_ref[b, 2 * j + 1] = final[6]
        return 0

    jax.lax.fori_loop(0, JOBS_BLOCK, one_job, 0)


def _use_interpret() -> bool:
    import os
    flag = os.environ.get('VCLUST_PALLAS_INTERPRET')
    if flag is not None:
        return flag not in ('0', 'false', '')
    return jax.default_backend() != 'tpu'


@partial(jax.jit, static_argnames=('aw', 'am', 'ar'))
def _run(qi, ri, qlim, rlim, njobs, q2d, r2d, aw, am, ar):
    n_blocks = qi.shape[1] // JOBS_BLOCK * qi.shape[0]
    kernel = partial(_extend_kernel, aw=aw, am=am, ar=ar)
    smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        interpret=_use_interpret(),
        grid=(n_blocks,),
        in_specs=[
            smem_full, smem_full, smem_full, smem_full, smem_full,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((qi.shape[0], 2 * JOBS_BLOCK),
                                       jnp.int32),
    )(qi, ri, qlim, rlim, njobs, q2d, r2d)


def pad_codes(codes: np.ndarray) -> np.ndarray:
    """Pad a code array with 4s (never matches) so any in-range extension
    slice stays in bounds; shaped (1, L) int32 for the kernel."""
    n = len(codes)
    L = ((n + SPAN - 1) // SPAN + 2) * SPAN
    out = np.full(L, 4, dtype=np.int32)
    out[:n] = codes
    return out.reshape(1, L)


def batched_extend(q2d, r2d, qi, ri, nq: int, nr: int,
                   aw: int = 15, am: int = 7, ar: int = 3):
    """Run forward extension jobs; returns (total_len, nt_match) arrays.

    q2d/r2d: pad_codes() outputs. qi/ri: int32 job start offsets.
    """
    n = len(qi)
    if n == 0:
        return np.empty(0, np.int32), np.empty(0, np.int32)
    n_blocks = (n + JOBS_BLOCK - 1) // JOBS_BLOCK
    qi_p = np.zeros((n_blocks, JOBS_BLOCK), np.int32)
    ri_p = np.zeros((n_blocks, JOBS_BLOCK), np.int32)
    qi_p.reshape(-1)[:n] = qi
    ri_p.reshape(-1)[:n] = ri
    qlim = np.full((n_blocks, JOBS_BLOCK), nq, np.int32)
    rlim = np.full((n_blocks, JOBS_BLOCK), nr, np.int32)
    out = _run(jnp.asarray(qi_p), jnp.asarray(ri_p), jnp.asarray(qlim),
               jnp.asarray(rlim),
               jnp.asarray([[n]], dtype=jnp.int32),
               jnp.asarray(q2d), jnp.asarray(r2d), aw, am, ar)
    out = np.asarray(out).reshape(n_blocks * JOBS_BLOCK, 2)
    return out[:n, 0], out[:n, 1]
