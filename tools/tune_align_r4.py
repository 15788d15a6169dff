"""Sweep the v2 sampling/election knobs against the golden example corpus
(tpu vs exact engine tani errors, worst pairs printed). One subprocess per
config (constants are read at import). CPU backend for determinism/speed.

Usage: python tools/tune_align_r4.py
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    {'VCLUST_ALIGN_MVF': '2', 'VCLUST_ALIGN_MVC': '3'},
    {'VCLUST_ALIGN_MVF': '2', 'VCLUST_ALIGN_MVC': '4'},
    {'VCLUST_ALIGN_EXTI': '5'},
    {'VCLUST_ALIGN_EXTMARGIN': '2'},
    {'VCLUST_ALIGN_EXTMIN': '13'},
    {'VCLUST_ALIGN_EXTMARGIN': '2', 'VCLUST_ALIGN_EXTMIN': '13',
     'VCLUST_ALIGN_EXTI': '5'},
]


def single():
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import numpy as np
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from vclust_tpu.models.input import load_genomes
    from vclust_tpu.models.align import run_align
    from vclust_tpu.utils.data import example_path
    genomes, _ = load_genomes(example_path('multifasta.fna'))
    ex = {(r.query, r.reference): r for r in run_align(genomes).rows}
    tp = {(r.query, r.reference): r
          for r in run_align(genomes, engine='tpu').rows}
    errs = []
    for key, e in ex.items():
        t = tp.get(key)
        if e.tani >= 0.3:
            errs.append((abs((t.tani if t else 0.0) - e.tani), key, e.tani,
                         t.tani if t else 0.0))
    errs.sort(reverse=True)
    worst = [(round(d, 4), '|'.join(k), round(et, 3), round(tt, 3))
             for d, k, et, tt in errs[:5]]
    infl = max((tp[k].tani - ex[k].tani)
               for k in tp if k in ex and ex[k].tani < 0.3 or True)
    print(json.dumps({'max_err': round(errs[0][0], 4),
                      'mean_err': round(sum(e[0] for e in errs)
                                        / len(errs), 4),
                      'max_inflation': round(max(
                          (tp[k].tani - ex[k].tani for k in tp if k in ex),
                          default=0.0), 4),
                      'worst': worst}))


def main():
    for cfg in CONFIGS:
        env = dict(os.environ, **cfg)
        r = subprocess.run([sys.executable, __file__, 'RUN'],
                           capture_output=True, text=True, env=env)
        out = [l for l in r.stdout.splitlines() if l.startswith('{')]
        tag = ','.join(f'{k.split("_")[-1]}={v}' for k, v in cfg.items())
        print(tag, out[-1] if out else 'FAIL ' + r.stderr[-300:], flush=True)


if __name__ == '__main__':
    if len(sys.argv) > 1:
        single()
    else:
        main()
