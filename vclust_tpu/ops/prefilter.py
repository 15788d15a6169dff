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


@jax.jit
def _occ_matmul_accum(counts, occ):
    """counts += occ @ occ.T on the MXU (bf16 x bf16 -> f32, exact for
    {0,1} blocks)."""
    return counts + jnp.dot(occ, occ.T, preferred_element_type=jnp.float32)


def shared_kmer_counts_device(kmer_sets, chunk_cols: int = 131072
                              ) -> np.ndarray:
    """Exact pairwise shared-k-mer counts for sorted distinct uint64 sets.

    The {0,1} occupancy block for each chunk of the distinct-k-mer universe
    is assembled host-side (O(nnz) writes; TPU scatter is slow) and the
    G x G count accumulation runs as MXU matmuls on device, overlapping
    transfer with compute via XLA's async dispatch.

    Returns an int64 (G, G) matrix whose diagonal is |kmers(g)|.
    """
    n = len(kmer_sets)
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    universe = np.unique(np.concatenate(
        [s for s in kmer_sets if len(s)] or [np.empty(0, np.uint64)]))
    if len(universe) == 0:
        return np.zeros((n, n), dtype=np.int64)
    gids_all = np.concatenate(
        [np.full(len(s), g, dtype=np.int32) for g, s in enumerate(kmer_sets)])
    cids_all = np.concatenate(
        [np.searchsorted(universe, s).astype(np.int64) for s in kmer_sets])
    order = np.argsort(cids_all, kind='stable')
    gids_all = gids_all[order]
    cids_all = cids_all[order]
    n_chunks = (len(universe) + chunk_cols - 1) // chunk_cols
    starts = np.searchsorted(cids_all, np.arange(n_chunks + 1) * chunk_cols)
    counts = jnp.zeros((n, n), jnp.float32)
    for c in range(n_chunks):
        lo, hi = starts[c], starts[c + 1]
        if hi == lo:
            continue
        occ = np.zeros((n, chunk_cols), dtype=np.float32)
        occ[gids_all[lo:hi], cids_all[lo:hi] - c * chunk_cols] = 1.0
        counts = _occ_matmul_accum(counts, jnp.asarray(
            occ, dtype=jnp.bfloat16))
    return np.rint(np.asarray(counts)).astype(np.int64)


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
