"""Unit tests for the interchange-format readers/writers and the number
formatting contracts (pinned against the golden files)."""

import sys

sys.path.insert(0, '.')

from conftest import REFERENCE_EXAMPLE
from vclust_tpu.io.formats import (FilterMatrix, read_fltr, write_fltr,
                                   read_ids, write_ids)
from vclust_tpu.utils.fmt import fmt_measure, fmt_len_ratio, fmt_fltr_value


def test_fmt_measure():
    assert fmt_measure(1.0) == '1'
    assert fmt_measure(0.575792) == '0.575792'
    assert fmt_measure(0.00525006) == '0.00525006'
    assert fmt_measure(0.9701234) == '0.970123'
    assert fmt_measure(39.0) == '39'
    assert fmt_measure(89.28934) == '89.2893'


def test_fmt_len_ratio():
    assert fmt_len_ratio(1.0) == '1'
    assert fmt_len_ratio(0.64) == '0.6400'
    assert fmt_len_ratio(0.902) == '0.9020'
    assert fmt_len_ratio(0.9927) == '0.9927'


def test_fmt_fltr_value():
    assert fmt_fltr_value(0.99848) == '0.998480'


def test_fltr_roundtrip(tmp_path):
    m = FilterMatrix(kmer_length=25, fraction=1.0,
                     names=['a', 'b', 'c'],
                     entries={(1, 0): 0.99848, (2, 0): 0.75})
    path = tmp_path / 'fltr.txt'
    write_fltr(path, m)
    back = read_fltr(path)
    assert back.kmer_length == 25
    assert back.fraction == 1.0
    assert back.names == m.names
    assert back.entries[(1, 0)] == 0.99848
    assert back.entries[(2, 0)] == 0.75
    assert back.lookup(0, 1) == 0.99848
    assert back.lookup(1, 2) is None


def test_fltr_golden_roundtrip(tmp_path):
    golden = str(REFERENCE_EXAMPLE / 'output' / 'fltr.txt')
    m = read_fltr(golden)
    out = tmp_path / 'fltr.txt'
    write_fltr(out, m)
    assert out.read_text() == open(golden).read()


def test_ids_roundtrip(tmp_path):
    objs = [('x', 100, 1), ('y', 50, 2)]
    path = tmp_path / 'ids.tsv'
    write_ids(path, objs)
    assert read_ids(path) == objs


def test_fasta_gzip_roundtrip(tmp_path):
    from vclust_tpu.io.fasta import read_fasta, write_fasta, FastaRecord
    recs = [FastaRecord('a', 'a desc', b'ACGT' * 50),
            FastaRecord('b', 'b', b'GATTACA')]
    path = tmp_path / 'x.fna.gz'
    write_fasta(path, recs, gzip_output=True)
    back = read_fasta(path)
    assert [r.id for r in back] == ['a', 'b']
    assert [r.seq for r in back] == [r.seq for r in recs]
    assert back[0].description == 'a desc'
