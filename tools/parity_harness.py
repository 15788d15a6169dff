#!/usr/bin/env python
"""Golden-parity harness: run the align stage on the reference example corpus
and score the output against /root/reference/example/output/*.

Usage: python tools/parity_harness.py [--policy gap_policy=prev seed_back=40 ...]
"""

import argparse
import sys
import time

sys.path.insert(0, '.')

from vclust_tpu.models.input import load_genomes          # noqa: E402
from vclust_tpu.utils.data import example_path
from vclust_tpu.models.align import run_align             # noqa: E402
from vclust_tpu.ops.lz_parse_py import AlignParams        # noqa: E402
from vclust_tpu.io.formats import write_ani, write_ids, write_aln  # noqa: E402
from vclust_tpu import ALIGN_OUTFMT                       # noqa: E402

GOLD = example_path('output')


def load_ani(path):
    rows = {}
    with open(path) as fh:
        hdr = fh.readline().rstrip('\n').split('\t')
        for line in fh:
            t = line.rstrip('\n').split('\t')
            d = dict(zip(hdr, t))
            rows[(d['query'], d['reference'])] = d
    return rows


def load_aln_keys(path):
    out = {}
    with open(path) as fh:
        fh.readline()
        for line in fh:
            t = line.rstrip('\n').split('\t')
            key = (t[0], t[1], int(t[4]), int(t[5]), int(t[6]), int(t[7]))
            out[key] = (int(t[8]), int(t[9]))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--set', nargs='*', default=[],
                    help='AlignParams overrides, e.g. gap_policy=split')
    ap.add_argument('--out', default='/tmp/parity')
    args = ap.parse_args()

    overrides = {}
    for kv in args.set:
        k, v = kv.split('=')
        cur = getattr(AlignParams(), k)
        if isinstance(cur, bool):
            v = v in ('1', 'true', 'True')
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        overrides[k] = v
    params = AlignParams(**overrides)
    print('params:', params)

    genomes, _ = load_genomes(example_path('multifasta.fna'))
    t0 = time.time()
    res = run_align(genomes, params=params, keep_alignments=True)
    dt = time.time() - t0
    import os
    os.makedirs(args.out, exist_ok=True)
    write_ids(f'{args.out}/ani.ids.tsv', res.objects)
    write_ani(f'{args.out}/ani.tsv', res.rows, ALIGN_OUTFMT['standard'])
    write_aln(f'{args.out}/ani.aln.tsv', res.alignments)

    G = load_ani(f'{GOLD}/ani.tsv')
    M = load_ani(f'{args.out}/ani.tsv')
    galn = load_aln_keys(f'{GOLD}/ani.aln.tsv')
    maln = load_aln_keys(f'{args.out}/ani.aln.tsv')

    ids_parity = open(f'{GOLD}/ani.ids.tsv').read() == \
        open(f'{args.out}/ani.ids.tsv').read()
    tsv_parity = open(f'{GOLD}/ani.tsv').read() == \
        open(f'{args.out}/ani.tsv').read()
    aln_parity = open(f'{GOLD}/ani.aln.tsv').read() == \
        open(f'{args.out}/ani.aln.tsv').read()

    exact = sum(1 for k in G if k in M and all(
        G[k][c] == M[k][c] for c in G[k]))
    errs = {c: [] for c in ['tani', 'gani', 'ani', 'qcov', 'rcov']}
    na = []
    for k in G:
        if k not in M:
            continue
        for c in errs:
            errs[c].append(abs(float(G[k][c]) - float(M[k][c])))
        na.append(abs(int(G[k]['num_alns']) - int(M[k]['num_alns'])))

    boundary_hits = len(set(galn) & set(maln))
    full_hits = sum(1 for k in galn if k in maln and galn[k] == maln[k])

    print(f'align wall time: {dt:.1f}s')
    print(f'ids parity: {ids_parity}  ani.tsv parity: {tsv_parity}  '
          f'aln parity: {aln_parity}')
    print(f'ani.tsv rows: golden {len(G)} mine {len(M)} '
          f'byte-identical {exact}')
    for c, v in errs.items():
        print(f'  {c}: max={max(v):.6f} mean={sum(v) / len(v):.6f}')
    print(f'  num_alns: max={max(na)} mean={sum(na) / len(na):.3f}')
    print(f'alignments: golden {len(galn)} mine {len(maln)} '
          f'boundary-match {boundary_hits} exact {full_hits}')


if __name__ == '__main__':
    main()
