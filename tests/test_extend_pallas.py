"""Pallas extension kernel vs the Python oracle (bit-exact).

Runs in interpret mode on CPU (the CI path); on real TPU the same tests
exercise the compiled kernel (VCLUST_PALLAS_INTERPRET=0).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, '.')

os.environ.setdefault('VCLUST_PALLAS_INTERPRET', '1')

# The interpret-mode compile of the kernel takes minutes on CPU, so these
# tests are opt-in (always worth running on a real TPU):
#   VCLUST_RUN_PALLAS_TESTS=1 pytest tests/test_extend_pallas.py
if not os.environ.get('VCLUST_RUN_PALLAS_TESTS'):
    import jax
    if jax.default_backend() != 'tpu':
        pytest.skip('pallas kernel tests are opt-in on CPU '
                    '(VCLUST_RUN_PALLAS_TESTS=1)', allow_module_level=True)

from vclust_tpu.ops.extend_pallas import pad_codes, batched_extend  # noqa
from vclust_tpu.ops.lz_parse_py import AlignParams, _extend         # noqa


def _oracle(q, r, jobs, p):
    return [_extend(q, r, a, b, 0, p) for a, b in jobs]


@pytest.fixture(scope='module')
def seqs():
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 4, 1500).astype(np.int8)
    q = ref.copy()
    sub = rng.random(len(q)) < 0.05
    q[sub] = (q[sub] + rng.integers(1, 4, sub.sum()).astype(np.int8)) % 4
    q[700:707] = 4   # N run
    return q, ref


def test_extension_matches_oracle(seqs):
    q, ref = seqs
    rng = np.random.default_rng(1)
    p = AlignParams()
    jobs = [(int(rng.integers(0, len(q) - 50)),) * 2 for _ in range(8)]
    jobs += [(int(rng.integers(0, len(q) - 50)),
              int(rng.integers(0, len(ref) - 50))) for _ in range(8)]
    qi = np.array([a for a, _ in jobs], np.int32)
    ri = np.array([b for _, b in jobs], np.int32)
    lens, matches = batched_extend(pad_codes(q), pad_codes(ref), qi, ri,
                                   len(q), len(ref), p.aw, p.am, p.ar)
    for k, (tl, m) in enumerate(_oracle(q, ref, jobs, p)):
        assert (int(lens[k]), int(matches[k])) == (tl, m), f'job {k}'


def test_extension_sequence_ends(seqs):
    q, ref = seqs
    p = AlignParams()
    jobs = [(len(q) - 10, len(ref) - 10), (len(q) - 1, 0),
            (0, len(ref) - 1), (0, 0)]
    qi = np.array([a for a, _ in jobs], np.int32)
    ri = np.array([b for _, b in jobs], np.int32)
    lens, matches = batched_extend(pad_codes(q), pad_codes(ref), qi, ri,
                                   len(q), len(ref), p.aw, p.am, p.ar)
    for k, (tl, m) in enumerate(_oracle(q, ref, jobs, p)):
        assert (int(lens[k]), int(matches[k])) == (tl, m), f'job {k}'


def test_extension_long_exact():
    p = AlignParams()
    rng = np.random.default_rng(2)
    ref = rng.integers(0, 4, 2500).astype(np.int8)
    q = ref.copy()             # fully identical: spans multiple blocks
    lens, matches = batched_extend(pad_codes(q), pad_codes(ref),
                                   np.array([0], np.int32),
                                   np.array([0], np.int32),
                                   len(q), len(ref), p.aw, p.am, p.ar)
    assert int(lens[0]) == 2500
    assert int(matches[0]) == 2500
