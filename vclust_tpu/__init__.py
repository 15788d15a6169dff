"""vclust-tpu: TPU-native ANI computation and clustering of viral genomes.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
refresh-bio/vclust (reference: /root/reference/vclust.py): shared-k-mer
prefiltering, Lempel-Ziv-style local alignment producing ANI measures, and six
clustering algorithms, plus FASTA deduplication.

Public constants mirror the reference's module-level API surface
(reference vclust.py:38-47), which downstream code imports directly.
"""

__version__ = '0.1.0'

from .utils.alloc import tune_host_allocator as _tune_host_allocator

_tune_host_allocator()

CITATION = (
    'vclust-tpu: TPU-native reimplementation of Vclust '
    '(Zielezinski A, Gudys A et al. (2025) Nat Methods, '
    'doi:10.1038/s41592-025-02701-7)'
)

# Columns emitted by the alignment stage (reference vclust.py:38-41).
ALIGN_FIELDS = [
    'qidx', 'ridx', 'query', 'reference', 'tani', 'gani', 'ani', 'qcov',
    'rcov', 'num_alns', 'len_ratio', 'qlen', 'rlen', 'nt_match', 'nt_mismatch',
]

# Output format presets (reference vclust.py:43-47).
ALIGN_OUTFMT = {
    'lite': ALIGN_FIELDS[:2] + ALIGN_FIELDS[4:11],
    'standard': ALIGN_FIELDS[:11],
    'complete': ALIGN_FIELDS[:],
}
