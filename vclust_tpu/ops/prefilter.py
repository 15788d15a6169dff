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
    from ..utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
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


def _group_coo(kmer_sets):
    """Host grouping of the (k-mer, genome) incidence by k-mer value.

    Returns (sg, shared_lens): entry genome ids sorted by k-mer (stable, so
    each group's entries stay in genome order) and per-group sizes, with
    singleton groups (k-mers in exactly one genome) dropped — they cannot
    contribute to off-diagonal shared counts.
    """
    nonempty = [s for s in kmer_sets if len(s)]
    if not nonempty:
        return (np.empty(0, np.int32), np.empty(0, np.int32))
    all_kmers = np.concatenate(nonempty)
    all_gids = np.concatenate(
        [np.full(len(s), g, dtype=np.int32) for g, s in enumerate(kmer_sets)
         if len(s)])
    order = np.argsort(all_kmers, kind='stable')
    sk = all_kmers[order]
    sg = all_gids[order]
    del order, all_kmers, all_gids
    starts = np.empty(len(sk), dtype=bool)
    starts[0] = True
    np.not_equal(sk[1:], sk[:-1], out=starts[1:])
    del sk
    start_idx = np.flatnonzero(starts)
    lens = np.diff(start_idx, append=len(sg))
    shared = lens >= 2
    sg = sg[np.repeat(shared, lens)]
    shared_lens = lens[shared].astype(np.int32)
    return sg, shared_lens


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _dedup_patterns(sg, lens):
    """kmer-db's pattern compression (SURVEY.md section 2.4.1): many k-mer
    groups share the same genome-id set ("pattern"); counting each distinct
    pattern once with a multiplicity weight shrinks the device work by the
    dedup ratio. Patterns are keyed by two independent 64-bit position-mixed
    hashes + length (collision odds ~ n_groups^2 / 2^128).

    Returns (sg_d, lens_d, weights) with weights int64.
    """
    n_groups = len(lens)
    if n_groups == 0:
        return sg, lens, np.ones(0, np.int64)
    starts = np.zeros(n_groups, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    pos = np.arange(len(sg), dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), lens)
    g64 = sg.astype(np.uint64)
    e1 = _mix64(g64 + (pos + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15))
    e2 = _mix64(g64 ^ ((pos + np.uint64(7)) * np.uint64(0xC2B2AE3D27D4EB4F)))
    h1 = np.add.reduceat(e1, starts)
    h2 = np.add.reduceat(e2, starts)
    order = np.lexsort((h2, h1, lens))
    l_s, h1_s, h2_s = lens[order], h1[order], h2[order]
    new = np.empty(n_groups, dtype=bool)
    new[0] = True
    new[1:] = ((l_s[1:] != l_s[:-1]) | (h1_s[1:] != h1_s[:-1])
               | (h2_s[1:] != h2_s[:-1]))
    pat_id_sorted = np.cumsum(new) - 1
    n_pat = int(pat_id_sorted[-1]) + 1
    weights = np.bincount(pat_id_sorted, minlength=n_pat).astype(np.int64)
    rep_group = order[new]            # first group of each distinct pattern
    lens_d = lens[rep_group]
    # Gather the representative groups' entries.
    rep_starts = starts[rep_group]
    out_starts = np.zeros(n_pat, dtype=np.int64)
    np.cumsum(lens_d[:-1], out=out_starts[1:])
    total = int(lens_d.sum())
    gather = (np.repeat(rep_starts, lens_d)
              + (np.arange(total, dtype=np.int64)
                 - np.repeat(out_starts, lens_d)))
    return sg[gather], lens_d, weights


class PrefilterIndex:
    """Pattern-compressed incidence index — the kmer-db `build` analog.

    Holds the deduplicated (pattern x genome) COO plus per-pattern
    multiplicities; `shared_kmer_counts_indexed` is the `all2all` analog
    that turns it into exact pair counts on the MXU.
    """

    def __init__(self, kmer_sets, dedup: bool = True, engine: str = 'auto'):
        self.n = len(kmer_sets)
        self.sizes = np.array([len(s) for s in kmer_sets], dtype=np.int64)
        if dedup and engine in ('auto', 'native'):
            from . import kmer_native
            native = kmer_native.build_index(kmer_sets)
            if native is not None:
                self.gids, self.lens, self.weights, self.n_groups = native
                return
            if engine == 'native':
                raise RuntimeError('native index engine unavailable')
        sg, lens = _group_coo(kmer_sets)
        self._finish(sg, lens, dedup)

    @classmethod
    def from_coo(cls, sorted_kmers, gids, sizes, dedup: bool = True):
        """Index from a k-mer-sorted (kmer, gid) COO — the path used by the
        out-of-core batch store, where the COO comes from merging persisted
        per-batch artifacts rather than from in-RAM k-mer sets."""
        self = cls.__new__(cls)
        self.n = len(sizes)
        self.sizes = np.asarray(sizes, dtype=np.int64)
        starts = np.empty(len(sorted_kmers), dtype=bool)
        if len(sorted_kmers):
            starts[0] = True
            np.not_equal(sorted_kmers[1:], sorted_kmers[:-1],
                         out=starts[1:])
            start_idx = np.flatnonzero(starts)
            lens = np.diff(start_idx, append=len(gids))
            shared = lens >= 2
            sg = gids[np.repeat(shared, lens)]
            lens = lens[shared].astype(np.int32)
        else:
            sg = np.empty(0, np.int32)
            lens = np.empty(0, np.int32)
        self._finish(sg, lens, dedup)
        return self

    def _finish(self, sg, lens, dedup):
        self.n_groups = len(lens)
        if dedup:
            sg, lens, weights = _dedup_patterns(sg, lens)
        else:
            weights = np.ones(len(lens), np.int64)
        self.gids = sg
        self.lens = lens
        self.weights = weights

    @property
    def dedup_ratio(self) -> float:
        return self.n_groups / max(len(self.lens), 1)


class BatchIndexStore:
    """Persisted per-batch incidence artifacts — the kmer-db `.kdb` analog
    (reference builds one reusable database per `--batch-size` part,
    vclust.py:1428-1442, and computes the all-vs-all blockwise via
    `all2all-parts`). Each batch stores its k-mer-sorted (kmer, gid) COO +
    per-genome set sizes as memmappable .npy files; the pair-count matrix
    is produced block-by-block by merging two batches' sorted streams, so
    host RAM holds at most two batches and each (i, j) block costs
    O(nnz_i + nnz_j) — no full-corpus COO is ever materialized.
    """

    def __init__(self, directory):
        import pathlib
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.batches = []     # list of (gid_offset, n_genomes)

    def add_batch(self, kmer_sets, gid_offset: int) -> int:
        """Persist one batch; genome ids are global (offset + local)."""
        b = len(self.batches)
        nonempty = [np.asarray(s, dtype=np.uint64) for s in kmer_sets]
        if any(len(s) for s in nonempty):
            ks = np.concatenate([s for s in nonempty if len(s)])
            gs = np.concatenate(
                [np.full(len(s), gid_offset + g, dtype=np.int32)
                 for g, s in enumerate(nonempty) if len(s)])
            order = np.argsort(ks, kind='stable')
            ks, gs = ks[order], gs[order]
        else:
            ks = np.empty(0, np.uint64)
            gs = np.empty(0, np.int32)
        np.save(self.dir / f'batch{b:05d}.kmers.npy', ks)
        np.save(self.dir / f'batch{b:05d}.gids.npy', gs)
        np.save(self.dir / f'batch{b:05d}.sizes.npy',
                np.array([len(s) for s in nonempty], dtype=np.int64))
        self.batches.append((gid_offset, len(kmer_sets)))
        return b

    def _load(self, b):
        mm = dict(mmap_mode='r')
        return (np.load(self.dir / f'batch{b:05d}.kmers.npy', **mm),
                np.load(self.dir / f'batch{b:05d}.gids.npy', **mm),
                np.load(self.dir / f'batch{b:05d}.sizes.npy'))

    def sizes(self):
        out = []
        for b in range(len(self.batches)):
            out.append(np.load(self.dir / f'batch{b:05d}.sizes.npy'))
        return np.concatenate(out) if out else np.empty(0, np.int64)

    def pair_block(self, i: int, j: int, mesh=None):
        """Exact shared-k-mer counts between batches i and j (i <= j).

        Returns (rows_offset, cols_offset, counts) where counts is the
        (n_i, n_j) int64 block (full square block for i == j).
        """
        ki, gi, szi = self._load(i)
        off_i, n_i = self.batches[i]
        if i == j:
            local = gi - off_i
            idx = PrefilterIndex.from_coo(np.asarray(ki), local, szi)
            counts = shared_kmer_counts_indexed(idx, mesh=mesh)
            return off_i, off_i, counts
        kj, gj, szj = self._load(j)
        off_j, n_j = self.batches[j]
        # Merge the two sorted streams (stable radix sort of the concat).
        ks = np.concatenate([np.asarray(ki), np.asarray(kj)])
        gs = np.concatenate([gi - off_i, gj - off_j + n_i])
        order = np.argsort(ks, kind='stable')
        ks, gs = ks[order], gs[order]
        sizes = np.concatenate([szi, szj])
        idx = PrefilterIndex.from_coo(ks, gs, sizes)
        counts = shared_kmer_counts_indexed(idx, mesh=mesh)
        return off_i, off_j, counts[:n_i, n_i:]


@partial(jax.jit, static_argnames=('n_rows', 'n_pad_rows', 'n_genomes',
                                   'nnz', 'n_limbs'))
def _group_matmul_accum_w(counts, gids, sizes, w_limbs, n_rows: int,
                          n_pad_rows: int, n_genomes: int, nnz: int,
                          n_limbs: int):
    """Weighted variant of _group_matmul_accum:
    counts += occ.T @ (w[:, None] * occ).

    TPU f32 matmuls run at reduced precision by default (bf16 passes), so a
    single f32 weighted matmul is NOT exact for large pattern weights.
    Instead the integer weights are decomposed into byte limbs
    w = sum_l 256^l * w_l: each (occ * w_l) is exact in bf16 (integers
    0..255), each matmul accumulates exactly in f32, and the limb results
    are recombined with exact power-of-two scales. Exact for weights < 2**24
    and counts < 2**24.
    """
    total_rows = n_rows + n_pad_rows
    rows = jnp.repeat(jnp.arange(total_rows, dtype=jnp.int32), sizes,
                      total_repeat_length=nnz)
    occ = jnp.zeros((total_rows, n_genomes + 1), jnp.bfloat16)
    occ = occ.at[rows, gids.astype(jnp.int32)].set(1)
    occ = occ[:n_rows, :n_genomes]
    acc = counts
    for limb in range(n_limbs):
        w = w_limbs[limb, :n_rows, None].astype(jnp.bfloat16)
        acc = acc + (256.0 ** limb) * jnp.dot(
            occ.T, occ * w, preferred_element_type=jnp.float32)
    return acc


from functools import lru_cache


@lru_cache(maxsize=64)
def _make_sharded_accum_w(mesh, n_rows: int, n_pad_rows: int,
                          n_genomes: int, nnz: int, n_limbs: int):
    """Mesh-sharded variant of _group_matmul_accum_w: the (genome, genome)
    counts matrix is row-sharded over the mesh; every device scatters the
    full occupancy chunk (O(nnz), cheap) and contracts only its row block
    on its MXU (O(rows x n^2 / n_dev)), so the dominant matmul scales
    linearly with devices and no counts traffic crosses the ICI at all
    (SURVEY.md section 7: tiled pair grid under shard_map)."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    shard = n_genomes // n_dev
    total_rows = n_rows + n_pad_rows

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(), P(), P()),
             out_specs=P(axis, None))
    def _step(counts_blk, gids_r, sizes_r, w_r):
        rows = jnp.repeat(jnp.arange(total_rows, dtype=jnp.int32), sizes_r,
                          total_repeat_length=nnz)
        occ = jnp.zeros((total_rows, n_genomes + 1), jnp.bfloat16)
        occ = occ.at[rows, gids_r.astype(jnp.int32)].set(1)
        occ = occ[:n_rows, :n_genomes]
        my = jax.lax.axis_index(axis)
        occ_p = jax.lax.dynamic_slice(
            occ, (0, my * shard), (n_rows, shard))
        acc = counts_blk
        for limb in range(n_limbs):
            w = w_r[limb, :n_rows, None].astype(jnp.bfloat16)
            acc = acc + (256.0 ** limb) * jnp.dot(
                occ_p.T, occ * w, preferred_element_type=jnp.float32)
        return acc

    return jax.jit(_step)


def _counts_from_index_host(index: 'PrefilterIndex') -> np.ndarray:
    """Host accumulation of pair counts from the pattern COO — exact, used
    for corpora too small to amortize a device compile."""
    n = index.n
    counts = np.zeros((n, n), dtype=np.int64)
    off = 0
    for ln, w in zip(index.lens, index.weights):
        g = index.gids[off:off + ln]
        counts[np.ix_(g, g)] += w
        off += ln
    np.fill_diagonal(counts, index.sizes)
    return counts


def shared_kmer_counts_indexed(index: 'PrefilterIndex',
                               rows_chunk: int = 131072,
                               nnz_chunk: int = 524288,
                               mesh=None, engine: str = 'auto') -> np.ndarray:
    """Exact pair counts from a PrefilterIndex (the kmer-db all2all-sp
    analog): chunked weighted occupancy matmul on the MXU. With `mesh`,
    the counts matrix is row-sharded over the mesh devices. engine='auto'
    answers tiny corpora on the host (a device compile would dominate);
    engine='device' forces the MXU path (used by bench validation)."""
    n = index.n
    if n == 0:
        return np.zeros((0, 0), dtype=np.int64)
    if engine == 'auto' and mesh is None and n <= 32:
        return _counts_from_index_host(index)
    sg, shared_lens, weights = index.gids, index.lens, index.weights
    n_dev = mesh.devices.size if mesh is not None else 1
    if n_dev <= 1:
        mesh = None
    # Pad the genome axis so the counts row shard divides evenly.
    n_p = -(-n // n_dev) * n_dev if mesh is not None else n
    rows_chunk = max(1024, min(rows_chunk, (1 << 28) // (4 * (n_p + 1))))
    rows_chunk, nnz_chunk = _adapt_chunks(sg, shared_lens, n, rows_chunk,
                                          nnz_chunk)
    assert nnz_chunk >= n_p, 'nnz_chunk must be >= number of genomes'
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        counts = jax.device_put(
            jnp.zeros((n_p, n_p), jnp.float32),
            NamedSharding(mesh, P(mesh.axis_names[0], None)))
    else:
        counts = jnp.zeros((n, n), jnp.float32)
    if len(shared_lens):
        cum, chunks = _chunk_groups(shared_lens, rows_chunk, nnz_chunk)
        pad_group = 8
        n_pad_rows = nnz_chunk // pad_group + 1
        assert weights.max(initial=0) < (1 << 24), 'pattern weight overflow'
        n_limbs = max(1, int(np.ceil(
            np.log2(max(float(weights.max(initial=1)), 2.0)) / 8)))
        gids_buf = np.full(nnz_chunk, n_p, dtype=np.int32)
        sizes_buf = np.zeros(rows_chunk + n_pad_rows, dtype=np.int32)
        w_buf = np.zeros((n_limbs, rows_chunk), dtype=np.float32)
        step = (_make_sharded_accum_w(mesh, rows_chunk, n_pad_rows, n_p,
                                      nnz_chunk, n_limbs)
                if mesh is not None else None)
        for g_lo, g_hi in chunks:
            lo, hi = int(cum[g_lo]), int(cum[g_hi])
            m = hi - lo
            ng = g_hi - g_lo
            gids_buf[:m] = sg[lo:hi]
            gids_buf[m:] = n_p
            sizes_buf[:] = 0
            sizes_buf[:ng] = shared_lens[g_lo:g_hi]
            w_buf[:] = 0
            w = weights[g_lo:g_hi]
            for limb in range(n_limbs):
                w_buf[limb, :ng] = (w >> (8 * limb)) & 0xFF
            pad = nnz_chunk - m
            n_full = pad // pad_group
            sizes_buf[rows_chunk:rows_chunk + n_full] = pad_group
            sizes_buf[rows_chunk + n_full] = pad - n_full * pad_group
            if mesh is not None:
                # .copy(): jnp.asarray is zero-copy on the CPU backend,
                # and these host buffers are mutated for the next chunk
                # while this dispatch may still be reading them.
                # replicate(): explicit mesh placement — required when the
                # mesh spans processes (multi-host), harmless otherwise.
                from ..parallel.distributed import replicate
                counts = step(counts, replicate(mesh, gids_buf.copy()),
                              replicate(mesh, sizes_buf.copy()),
                              replicate(mesh, w_buf.copy()))
            else:
                counts = _group_matmul_accum_w(
                    counts, jnp.asarray(gids_buf.copy()),
                    jnp.asarray(sizes_buf.copy()),
                    jnp.asarray(w_buf.copy()), rows_chunk, n_pad_rows, n,
                    nnz_chunk, n_limbs)
    from ..parallel.distributed import fetch
    counts = np.rint(fetch(counts)).astype(np.int64)[:n, :n]
    np.fill_diagonal(counts, index.sizes)
    return counts


def _adapt_chunks(sg, shared_lens, n, rows_chunk, nnz_chunk):
    """Shrink chunk buffers to the data (pow2-bucketed so compile shapes
    stay few) — small inputs then compile/scatter small kernels."""
    nnz_total = max(int(len(sg)), n + 1, 1024)
    nnz_chunk = min(nnz_chunk, 1 << int(np.ceil(np.log2(nnz_total))))
    ng = max(int(len(shared_lens)), 1024)
    rows_chunk = min(rows_chunk, 1 << int(np.ceil(np.log2(ng))))
    return rows_chunk, nnz_chunk


def _chunk_groups(shared_lens, rows_chunk, nnz_chunk):
    """Cut groups into chunks of <= rows_chunk groups and <= nnz_chunk
    entries; returns (cum_entry_offsets, [(g_lo, g_hi), ...])."""
    n_groups = len(shared_lens)
    cum = np.concatenate([[0], np.cumsum(shared_lens, dtype=np.int64)])
    chunks = []
    g = 0
    while g < n_groups:
        g_end = min(g + rows_chunk, n_groups)
        g_end = min(g_end, int(np.searchsorted(
            cum, cum[g] + nnz_chunk, side='right')) - 1)
        assert g_end > g, 'group larger than nnz_chunk'
        chunks.append((g, g_end))
        g = g_end
    return cum, chunks


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
    sg, shared_lens = _group_coo(kmer_sets)
    # Cap the occupancy block (rows_chunk x (n+1) bf16) at ~1 GiB HBM.
    rows_chunk = max(1024, min(rows_chunk, (1 << 30) // (2 * (n + 1))))
    rows_chunk, nnz_chunk = _adapt_chunks(sg, shared_lens, n, rows_chunk,
                                          nnz_chunk)
    assert nnz_chunk >= n, 'nnz_chunk must be >= number of genomes'
    counts = jnp.zeros((n, n), jnp.float32)
    n_groups = len(shared_lens)
    if n_groups:
        # Entry offset of each group; chunks cut at every rows_chunk-th
        # group and wherever nnz_chunk entries would be exceeded. Every
        # chunk ships the same fixed-size buffers (one compiled kernel).
        cum, chunks = _chunk_groups(shared_lens, rows_chunk, nnz_chunk)
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
            # .copy(): see shared_kmer_counts_indexed — CPU jnp.asarray
            # aliases host buffers that are mutated for the next chunk.
            counts = _group_matmul_accum(
                counts, jnp.asarray(gids_buf.copy()),
                jnp.asarray(sizes_buf.copy()),
                rows_chunk, n_pad_rows, n, nnz_chunk)
    counts = np.rint(np.asarray(counts)).astype(np.int64)
    np.fill_diagonal(counts, sizes)
    return counts


@partial(jax.jit, static_argnames=('n_rows', 'n_pad_rows', 'n_genomes',
                                   'panel', 'nnz'))
def _panel_matmul_accum(counts, gids_all, gids_panel, sizes, n_rows: int,
                        n_pad_rows: int, n_genomes: int, panel: int,
                        nnz: int):
    """Panel variant of _group_matmul_accum: two occupancy scatters (panel
    columns and all columns) and counts += occ_panel.T @ occ_all, so only a
    (panel x n_genomes) block of the pair-count matrix is materialized."""
    total_rows = n_rows + n_pad_rows
    rows = jnp.repeat(jnp.arange(total_rows, dtype=jnp.int32), sizes,
                      total_repeat_length=nnz)
    occ = jnp.zeros((total_rows, n_genomes + 1), jnp.bfloat16)
    occ = occ.at[rows, gids_all.astype(jnp.int32)].set(1)
    occ_p = jnp.zeros((total_rows, panel + 1), jnp.bfloat16)
    occ_p = occ_p.at[rows, gids_panel.astype(jnp.int32)].set(1)
    return counts + jnp.dot(occ_p[:n_rows, :panel].T,
                            occ[:n_rows, :n_genomes],
                            preferred_element_type=jnp.float32)


def shared_kmer_counts_panels(kmer_sets, panel: int = 4096,
                              rows_chunk: int = 131072,
                              nnz_chunk: int = 524288):
    """Stream the pair-count matrix in row panels of `panel` genomes.

    The out-of-core analog of kmer-db's `--batch-size`/`all2all-parts` mode
    (reference vclust.py:1404-1462, SURVEY.md section 5.7), TPU-shaped: HBM
    holds one (panel x n) f32 block plus the occupancy chunk instead of the
    dense (n x n) matrix, so n scales to ~1e5+ genomes on one chip.

    Yields (lo, hi, counts_block) with counts_block int64 of shape
    (hi-lo, n); diagonal entries are set to the genome's k-mer-set size.
    Exactness matches shared_kmer_counts_device (same bf16/f32 math).
    """
    n = len(kmer_sets)
    if n == 0:
        return
    sizes = np.array([len(s) for s in kmer_sets], dtype=np.int64)
    sg, shared_lens = _group_coo(kmer_sets)
    panel = min(panel, n)
    rows_chunk = max(
        1024, min(rows_chunk, (1 << 30) // (2 * (n + panel + 2))))
    rows_chunk, nnz_chunk = _adapt_chunks(sg, shared_lens, n, rows_chunk,
                                          nnz_chunk)
    assert nnz_chunk >= n, 'nnz_chunk must be >= number of genomes'
    n_groups = len(shared_lens)
    group_of_entry = (np.repeat(np.arange(n_groups, dtype=np.int64),
                                shared_lens)
                      if n_groups else np.empty(0, np.int64))
    pad_group = 8
    n_pad_rows = nnz_chunk // pad_group + 1
    for lo in range(0, n, panel):
        hi = min(lo + panel, n)
        counts = jnp.zeros((panel, n), jnp.float32)
        if n_groups:
            # Keep only groups with >= 1 member in [lo, hi): others cannot
            # touch this row panel.
            in_panel = (sg >= lo) & (sg < hi)
            touched = np.zeros(n_groups, dtype=bool)
            touched[group_of_entry[in_panel]] = True
            keep_entries = touched[group_of_entry]
            sg_sel = sg[keep_entries]
            lens_sel = shared_lens[touched]
            cum, chunks = _chunk_groups(lens_sel, rows_chunk, nnz_chunk)
            gids_buf = np.full(nnz_chunk, n, dtype=np.int32)
            gidp_buf = np.full(nnz_chunk, panel, dtype=np.int32)
            sizes_buf = np.zeros(rows_chunk + n_pad_rows, dtype=np.int32)
            for g_lo, g_hi in chunks:
                e_lo, e_hi = int(cum[g_lo]), int(cum[g_hi])
                m = e_hi - e_lo
                ng = g_hi - g_lo
                chunk_g = sg_sel[e_lo:e_hi]
                gids_buf[:m] = chunk_g
                gids_buf[m:] = n
                inp = (chunk_g >= lo) & (chunk_g < hi)
                gidp_buf[:m] = np.where(inp, chunk_g - lo, panel)
                gidp_buf[m:] = panel
                sizes_buf[:] = 0
                sizes_buf[:ng] = lens_sel[g_lo:g_hi]
                pad = nnz_chunk - m
                n_full = pad // pad_group
                sizes_buf[rows_chunk:rows_chunk + n_full] = pad_group
                sizes_buf[rows_chunk + n_full] = pad - n_full * pad_group
                # .copy(): see shared_kmer_counts_indexed.
                counts = _panel_matmul_accum(
                    counts, jnp.asarray(gids_buf.copy()),
                    jnp.asarray(gidp_buf.copy()),
                    jnp.asarray(sizes_buf.copy()), rows_chunk, n_pad_rows,
                    n, panel, nnz_chunk)
        block = np.rint(np.asarray(counts[:hi - lo])).astype(np.int64)
        block[np.arange(hi - lo), np.arange(lo, hi)] = sizes[lo:hi]
        yield lo, hi, block


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


def shared_kmer_counts(kmer_sets, backend: str = 'auto',
                       mesh=None) -> np.ndarray:
    if backend == 'host':
        return shared_kmer_counts_host(kmer_sets)
    if backend == 'auto':
        # Tiny inputs: the host sort-merge beats one-off jit compilation.
        if not _HAVE_JAX or len(kmer_sets) <= 32:
            return shared_kmer_counts_host(kmer_sets)
    return shared_kmer_counts_indexed(PrefilterIndex(kmer_sets), mesh=mesh)


def ani_shorter(counts: np.ndarray, sizes: np.ndarray, k: int,
                row_sizes: np.ndarray = None) -> np.ndarray:
    """kmer-db's `ani-shorter` estimate from shared-k-mer counts.

    [VERIFIED-EMPIRICAL in SURVEY.md section 2.4.5 against golden fltr.txt]:
        c = shared / min(|A|, |B|)            (containment on the shorter)
        ani_shorter = 1 + ln(2c / (1 + c)) / k

    counts may be the square (n, n) matrix (row_sizes=None) or a row-panel
    block (B, n) with row_sizes the B per-row k-mer-set sizes.
    """
    sizes = np.asarray(sizes, dtype=np.float64)
    rs = sizes if row_sizes is None else np.asarray(row_sizes, np.float64)
    min_sizes = np.minimum(rs[:, None], sizes[None, :])
    with np.errstate(divide='ignore', invalid='ignore'):
        c = counts / np.maximum(min_sizes, 1)
        s = 1.0 + np.log(2.0 * c / (1.0 + c)) / k
    s[counts == 0] = -np.inf
    return s
