"""Round-5 v3-vs-v2 align engine timing on the real chip.

Builds bench.py's two align corpora (48 full-length genomes 38-64 kb;
128 contigs of 3.5 kb) and times all2all under each pipe. Run:
    python tools/v3_bench.py [v3|v2|both] [full|contig|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def corpus_full():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.utils.data import example_path
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    return bench.make_align_corpus(genomes)


def corpus_contig():
    import bench
    return bench.make_contig_corpus()


def run(pipe, which):
    os.environ['VCLUST_ALIGN_PIPE'] = pipe
    from vclust_tpu.models.align import _genome_codes, order_objects
    from vclust_tpu.ops import align_tpu
    corpus = corpus_full() if which == 'full' else corpus_contig()
    order = order_objects(corpus)
    codes = [_genome_codes(corpus[i]) for i in order]
    n = len(codes)
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     dtype=np.int32)
    t0 = time.time()
    idx = align_tpu.GenomeIndexTPU(codes)
    align_tpu.all2all_tpu(codes, pairs, index=idx)
    t_first = time.time() - t0
    best = None
    for _ in range(3):
        t0 = time.time()
        out = align_tpu.all2all_tpu(codes, pairs, index=idx)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f'[{pipe} {which}] n={n} pairs={len(pairs)} '
          f'first={t_first:.1f}s warm={best:.3f}s '
          f'rate={len(pairs)/best:.0f} pairs/s '
          f'sum_match={int(out[:,1].sum()+out[:,4].sum())}', flush=True)


if __name__ == '__main__':
    pipes = sys.argv[1] if len(sys.argv) > 1 else 'v3'
    whichs = sys.argv[2] if len(sys.argv) > 2 else 'both'
    for w in (['full', 'contig'] if whichs == 'both' else [whichs]):
        for p in (['v3', 'v2'] if pipes == 'both' else [pipes]):
            run(p, w)
