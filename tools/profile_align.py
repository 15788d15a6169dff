"""Capture a jax.profiler trace of the full-genome TPU align path and
print the top device ops by total duration (parsed from the perfetto
trace.json.gz — no tensorboard needed).

Usage: python tools/profile_align.py [full|contig]
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, '.')

import numpy as np


def main(corpus='full'):
    import jax
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.align import _genome_codes, order_objects
    from vclust_tpu.utils.data import example_path
    from vclust_tpu.ops import align_tpu
    import bench
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    corp = (bench.make_align_corpus(genomes) if corpus == 'full'
            else bench.make_contig_corpus())
    order = order_objects(corp)
    codes = [_genome_codes(corp[i]) for i in order]
    n = len(corp)
    pairs = np.array([(i, j) for i in range(n) for j in range(i + 1, n)],
                     dtype=np.int32)
    idx = align_tpu.GenomeIndexTPU(codes)
    align_tpu.all2all_tpu(codes, pairs, index=idx)   # compile + warm

    tdir = f'/tmp/jaxtrace_{corpus}'
    os.system(f'rm -rf {tdir}')
    with jax.profiler.trace(tdir):
        t0 = time.time()
        align_tpu.all2all_tpu(codes, pairs, index=idx)
        wall = time.time() - t0
    print(f'warm wall: {wall:.3f}s  ({len(pairs) / wall:.1f} pairs/s)')

    files = glob.glob(f'{tdir}/**/*.trace.json.gz', recursive=True)
    assert files, f'no trace under {tdir}'
    with gzip.open(files[0], 'rt') as f:
        trace = json.load(f)
    events = trace.get('traceEvents', [])
    # Find device lanes (TPU op track): pids whose thread names mention XLA
    # Ops / TensorFlow Op; fall back to summing complete events by name.
    durs = defaultdict(float)
    cnts = defaultdict(int)
    for e in events:
        if e.get('ph') != 'X':
            continue
        name = e.get('name', '')
        cat = str(e.get('args', {}).get('group_id', ''))
        tid_name = ''
        durs[name] += e.get('dur', 0)
        cnts[name] += 1
    total = sum(durs.values())
    print(f'total op-time (all lanes, us): {total:.0f}')
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[:40]:
        print(f'{d/1e3:10.2f} ms  x{cnts[name]:5d}  {name[:100]}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'full')
