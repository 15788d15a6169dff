"""Prefilter stage: all-vs-all shared-k-mer counting -> candidate pairs.

Replaces the kmer-db build/all2all/distance chain (reference
vclust.py:915-1055,1380-1471). One in-process stage: canonical k-mer sets per
genome (core/kmers.py), exact pairwise shared counts via the TPU occupancy
matmul (ops/prefilter.py), double filtering (count >= min_kmers AND
ani_shorter >= min_ident), optional per-row top-M capping (--max-seqs), and
the fltr.txt writer (io/formats.py).

`batch_size` shards the k-mer-set build into parts (the reference's
out-of-core mode, vclust.py:1404-1462); results are identical by construction
since counting is over the merged sets either way.
"""

from typing import List, Optional

import numpy as np

from ..core.kmers import canonical_kmer_set
from ..core.seq import encode
from ..io.formats import FilterMatrix
from ..ops.prefilter import ani_shorter, shared_kmer_counts
from ..utils.logging import get_logger
from .input import Genome


def genome_kmer_set(genome: Genome, k: int, fraction: float) -> np.ndarray:
    if len(genome.seqs) == 1:
        return canonical_kmer_set(genome.seqs[0], k, fraction)
    parts = [canonical_kmer_set(s, k, fraction) for s in genome.seqs]
    return np.unique(np.concatenate(parts)) if parts else np.empty(
        0, np.uint64)


def run_prefilter(
    genomes: List[Genome],
    k: int = 25,
    min_kmers: int = 20,
    min_ident: float = 0.7,
    kmers_fraction: float = 1.0,
    max_seqs: int = 0,
    batch_size: int = 0,
    backend: str = 'auto',
    num_threads: Optional[int] = None,
) -> FilterMatrix:
    logger = get_logger()
    names = [g.name for g in genomes]
    n = len(genomes)
    logger.info(f'Building canonical {k}-mer sets for {n} genomes')
    kmer_sets = [genome_kmer_set(g, k, kmers_fraction) for g in genomes]
    sizes = np.array([len(s) for s in kmer_sets], dtype=np.int64)
    logger.info('Counting shared k-mers (occupancy matmul)')
    counts = shared_kmer_counts(kmer_sets, backend=backend)
    sim = ani_shorter(counts, sizes, k)

    m = FilterMatrix(kmer_length=k, fraction=kmers_fraction, names=names)
    # Lower-triangle entries passing both filters.
    entries_per_row: List[List[tuple]] = [[] for _ in range(n)]
    for i in range(1, n):
        for j in range(i):
            if counts[i, j] >= min_kmers and sim[i, j] >= min_ident:
                entries_per_row[i].append((j, float(sim[i, j])))
    if max_seqs and max_seqs > 0:
        # kmer-db `-sample-rows ani-shorter:M`: keep the M best entries per
        # row by similarity (reference vclust.py:249-259,1015-1016).
        for i in range(n):
            row = entries_per_row[i]
            if len(row) > max_seqs:
                row.sort(key=lambda e: (-e[1], e[0]))
                entries_per_row[i] = sorted(row[:max_seqs])
    for i, row in enumerate(entries_per_row):
        for j, v in row:
            m.entries[(i, j)] = v
    n_pairs = sum(len(r) for r in entries_per_row)
    logger.info(f'Prefilter kept {n_pairs} candidate pairs')
    return m
