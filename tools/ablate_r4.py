"""Round-4 stage ablation of the TPU align engine on the real chip.

Runs the bench.py full-genome corpus (48 genomes, 38-64kb) and the contig
corpus (128 x 3.5kb) through all2all_tpu with VCLUST_ALIGN_ABLATE set to
each stage cutoff ('' full, 'join', 'elect', 'eval'), one subprocess per
mode (the env var is read at import time). Prints warm seconds per mode;
the difference between consecutive cutoffs is that stage's cost.

Usage: python tools/ablate_r4.py            # orchestrate all modes
       python tools/ablate_r4.py RUN <mode> <corpus>   # single run
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def single(mode, corpus):
    os.environ['VCLUST_ALIGN_ABLATE'] = mode
    import numpy as np
    sys.path.insert(0, '.')
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.align import _genome_codes, order_objects
    from vclust_tpu.utils.data import example_path
    import bench
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    if corpus == 'full':
        corp = bench.make_align_corpus(genomes)
    else:
        corp = bench.make_contig_corpus()
    from vclust_tpu.ops import align_tpu
    order = order_objects(corp)
    codes = [_genome_codes(corp[i]) for i in order]
    n = len(corp)
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     dtype=np.int32)
    t0 = time.time()
    idx = align_tpu.GenomeIndexTPU(codes)
    t_index = time.time() - t0
    t0 = time.time()
    align_tpu.all2all_tpu(codes, pairs, index=idx)
    t_first = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        align_tpu.all2all_tpu(codes, pairs, index=idx)
        best = min(best, time.time() - t0)
    print(json.dumps({'mode': mode or 'full', 'corpus': corpus,
                      'warm_s': round(best, 3),
                      'index_s': round(t_index, 3),
                      'compile_s': round(t_first - best, 1),
                      'pairs_per_s': round(len(pairs) / best, 1)}))


def main():
    for corpus in ('full', 'contig'):
        for mode in ('join', 'elect', 'eval', ''):
            r = subprocess.run(
                [sys.executable, __file__, 'RUN', mode, corpus],
                capture_output=True, text=True)
            out = [l for l in r.stdout.splitlines() if l.startswith('{')]
            print(out[-1] if out else f'FAIL {mode} {corpus}: '
                  f'{r.stderr[-500:]}')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'RUN':
        single(sys.argv[2], sys.argv[3])
    else:
        main()
