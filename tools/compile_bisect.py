"""Bisect the cold-compile cost of the 65536-bucket align program.

Compiles _group_run at (Lq=Lr=65536, K=8, B=28) under each ablation
cutoff ('join' stops after the sort join, 'elect' after election, 'eval'
after match flags, '' = full) in a fresh subprocess with a cleared
persistent cache, and prints the compile wall time per stage — the delta
between cutoffs is that stage's compile cost.

Usage: python tools/compile_bisect.py [RUN <mode>]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def single(mode):
    os.environ['VCLUST_ALIGN_ABLATE'] = mode
    os.environ['VCLUST_JAX_CACHE'] = '0'
    import numpy as np
    import jax.numpy as jnp
    from vclust_tpu.ops import align_tpu
    rng = np.random.default_rng(0)
    codes = [rng.integers(0, 4, 60000).astype(np.int8) for _ in range(10)]
    idx = align_tpu.GenomeIndexTPU(codes)
    b = idx.ensure(65536, list(range(10)))
    B, K = int(os.environ.get('BISECT_B', 8)), 8
    r_rows = np.zeros(B, np.int32)
    rlens = np.full(B, 60000, np.int32)
    q_rows = np.zeros((B, K), np.int32)
    qlens = np.full((B, K), 60000, np.int32)
    t0 = time.time()
    align_tpu._group_run(
        b['sv_f'], b['pk1_f'], b['pk2_f'], b['sv_r'], b['pk1_r'],
        b['pk2_r'], b['r2dov'],
        {'fwd': b['fwd'], 'qsv': b['qsv'], 'qoff': b['qoff']},
        jnp.asarray(r_rows), jnp.asarray(rlens), jnp.asarray(q_rows),
        jnp.asarray(qlens), Lq=65536, Lr=65536, K=K, mqd=40, mrd=40,
        reg=35, pack_bits=32)[0].block_until_ready()
    print(f'MODE={mode or "full"} compile+run: {time.time() - t0:.1f}s',
          flush=True)


def main():
    for mode in ('join', 'elect', 'eval', ''):
        r = subprocess.run([sys.executable, __file__, 'RUN', mode],
                           capture_output=True, text=True)
        out = [l for l in r.stdout.splitlines() if l.startswith('MODE')]
        print(out[-1] if out else f'FAIL {mode}: {r.stderr[-300:]}',
              flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1:
        single(sys.argv[2])
    else:
        main()
