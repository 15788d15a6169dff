"""Shared-k-mer counting as a blocked occupancy matmul on the MXU.

TPU-native replacement for kmer-db's pattern-compressed inverted index
(reference contract: vclust.py:915-1055; SURVEY.md section 2.4). Instead of a
k-mer -> sample-set index, we materialize, per chunk of the distinct-k-mer
universe, a {0,1} occupancy matrix Occ[g, m] ("genome g contains universe
k-mer m") and accumulate shared-k-mer counts as Occ @ Occ.T. The products are
exact in bfloat16 (values are 0/1) with float32 accumulation, so counts are
exact integers up to 2**24 — far above any genome's distinct-k-mer count.

The occupancy scatter and matmul run under one jit per chunk; the universe and
per-genome column ids are built host-side from sorted uint64 k-mer arrays
(JAX has no uint64 by default).
"""

from functools import partial

import numpy as np

try:
    import jax
    import jax.numpy as jnp
    _HAVE_JAX = True
except Exception:  # pragma: no cover
    _HAVE_JAX = False


@partial(jax.jit, static_argnames=('n_rows', 'n_pad_rows', 'n_genomes',
                                   'nnz'))
def _group_matmul_accum(counts, gids, sizes, n_rows: int, n_pad_rows: int,
                        n_genomes: int, nnz: int):
    """Scatter a chunk of the (shared-k-mer-group x genome) {0,1} occupancy
    and accumulate counts += occ.T @ occ on the MXU.

    bf16 inputs are exact for {0,1}; f32 accumulation is exact up to 2**24
    shared k-mers per pair. To minimize host-link traffic only the genome
    ids and per-group sizes are shipped; row ids are reconstructed on
    device with a repeat. Padding: pad entries carry the dump column
    `n_genomes` and are spread over pad rows beyond `n_rows` (a single hot
    duplicated scatter index is pathologically slow on TPU); both dump
    column and pad rows are sliced off before the matmul.
    """
    total_rows = n_rows + n_pad_rows
    rows = jnp.repeat(jnp.arange(total_rows, dtype=jnp.int32), sizes,
                      total_repeat_length=nnz)
    occ = jnp.zeros((total_rows, n_genomes + 1), jnp.bfloat16)
    occ = occ.at[rows, gids.astype(jnp.int32)].set(1)
    occ = occ[:n_rows, :n_genomes]
    return counts + jnp.dot(occ.T, occ, preferred_element_type=jnp.float32)


def shared_kmer_counts_device(kmer_sets, rows_chunk: int = 131072,
                              nnz_chunk: int = 524288) -> np.ndarray:
    """Exact pairwise shared-k-mer counts for sorted distinct uint64 sets.

    TPU-native variant of kmer-db's pattern-compressed all2all (SURVEY.md
    section 2.4): only k-mers present in >= 2 genomes contribute to
    off-diagonal counts, so the host groups the (k-mer, genome) incidence by
    k-mer, drops singleton groups, and ships the surviving COO to the chip,
    where each chunk is scattered into a {0,1} (groups x genomes) occupancy
    block and reduced as one MXU matmul: counts += occ.T @ occ.

    Returns an int64 (G, G) matrix whose diagonal is |kmers(g)|.
    """
    n = len(kmer_sets)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    sizes = np.array([len(s) for s in kmer_sets], dtype=np.int64)
    nonempty = [s for s in kmer_sets if len(s)]
    if not nonempty:
        return np.zeros((n, n), dtype=np.int64)
    all_kmers = np.concatenate(nonempty)
    all_gids = np.concatenate(
        [np.full(len(s), g, dtype=np.int32) for g, s in enumerate(kmer_sets)
         if len(s)])
    # Stable sort by k-mer: rows of each group stay in genome order.
    order = np.argsort(all_kmers, kind='stable')
    sk = all_kmers[order]
    sg = all_gids[order]
    del order
    # Group boundaries; keep only k-mers shared by >= 2 genomes.
    starts = np.empty(len(sk), dtype=bool)
    starts[0] = True
    np.not_equal(sk[1:], sk[:-1], out=starts[1:])
    del sk
    start_idx = np.flatnonzero(starts)
    lens = np.diff(start_idx, append=len(sg))
    shared = lens >= 2
    sg = sg[np.repeat(shared, lens)]
    shared_lens = lens[shared].astype(np.int32)
    del starts, start_idx, lens, shared
    assert nnz_chunk >= n, 'nnz_chunk must be >= number of genomes'
    counts = jnp.zeros((n, n), jnp.float32)
    n_groups = len(shared_lens)
    if n_groups:
        # Entry offset of each group; chunks cut at every rows_chunk-th
        # group and wherever nnz_chunk entries would be exceeded. Every
        # chunk ships the same fixed-size buffers (one compiled kernel).
        cum = np.concatenate([[0], np.cumsum(shared_lens, dtype=np.int64)])
        g = 0
        chunks = []
        while g < n_groups:
            g_end = min(g + rows_chunk, n_groups)
            # largest group index with cum[end] - cum[g] <= nnz_chunk
            g_end = min(g_end, int(np.searchsorted(
                cum, cum[g] + nnz_chunk, side='right')) - 1)
            assert g_end > g, 'group larger than nnz_chunk'
            chunks.append((g, g_end))
            g = g_end
        # Pad "groups" of size 8 spread over extra rows (see kernel doc).
        pad_group = 8
        n_pad_rows = nnz_chunk // pad_group + 1
        gids_buf = np.full(nnz_chunk, n, dtype=np.int32)
        sizes_buf = np.zeros(rows_chunk + n_pad_rows, dtype=np.int32)
        for g_lo, g_hi in chunks:
            lo, hi = int(cum[g_lo]), int(cum[g_hi])
            m = hi - lo
            ng = g_hi - g_lo
            gids_buf[:m] = sg[lo:hi]
            gids_buf[m:] = n
            sizes_buf[:] = 0
            sizes_buf[:ng] = shared_lens[g_lo:g_hi]
            pad = nnz_chunk - m
            n_full = pad // pad_group
            sizes_buf[rows_chunk:rows_chunk + n_full] = pad_group
            sizes_buf[rows_chunk + n_full] = pad - n_full * pad_group
            counts = _group_matmul_accum(
                counts, jnp.asarray(gids_buf), jnp.asarray(sizes_buf),
                rows_chunk, n_pad_rows, n, nnz_chunk)
    counts = np.rint(np.asarray(counts)).astype(np.int64)
    np.fill_diagonal(counts, sizes)
    return counts


def shared_kmer_counts_host(kmer_sets) -> np.ndarray:
    """Numpy reference implementation (sort-merge intersections)."""
    n = len(kmer_sets)
    counts = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        counts[i, i] = len(kmer_sets[i])
        for j in range(i):
            counts[i, j] = counts[j, i] = len(
                np.intersect1d(kmer_sets[i], kmer_sets[j],
                               assume_unique=True))
    return counts


def shared_kmer_counts(kmer_sets, backend: str = 'auto') -> np.ndarray:
    if backend == 'host':
        return shared_kmer_counts_host(kmer_sets)
    if backend == 'auto':
        # Tiny inputs: the host sort-merge beats one-off jit compilation.
        if not _HAVE_JAX or len(kmer_sets) <= 32:
            return shared_kmer_counts_host(kmer_sets)
    return shared_kmer_counts_device(kmer_sets)


def ani_shorter(counts: np.ndarray, sizes: np.ndarray, k: int) -> np.ndarray:
    """kmer-db's `ani-shorter` estimate from shared-k-mer counts.

    [VERIFIED-EMPIRICAL in SURVEY.md section 2.4.5 against golden fltr.txt]:
        c = shared / min(|A|, |B|)            (containment on the shorter)
        ani_shorter = 1 + ln(2c / (1 + c)) / k
    """
    sizes = np.asarray(sizes, dtype=np.float64)
    min_sizes = np.minimum(sizes[:, None], sizes[None, :])
    with np.errstate(divide='ignore', invalid='ignore'):
        c = counts / np.maximum(min_sizes, 1)
        s = 1.0 + np.log(2.0 * c / (1.0 + c)) / k
    s[counts == 0] = -np.inf
    return s
