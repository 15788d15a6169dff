"""CLI surface tests, mirroring the reference's pinned behaviors
(reference test.py:41-159)."""

import pytest

from conftest import (run_vclust, DATASET_FILES, FASTA_DIR, FASTA_FILE,
                      ANI_FILE, IDS_FILE)


@pytest.mark.parametrize('subcommand', [
    'deduplicate', 'prefilter', 'align', 'cluster', 'info',
])
def test_bare_subcommand_prints_help(subcommand):
    p = run_vclust([subcommand])
    assert p.returncode == 0
    assert not p.stderr
    assert p.stdout


def test_bare_invocation_prints_help():
    p = run_vclust([])
    assert p.returncode == 0
    assert not p.stderr
    assert p.stdout


def test_version():
    p = run_vclust(['--version'])
    assert p.returncode == 0
    assert p.stdout.startswith('v')


@pytest.mark.parametrize('inputs,params,error_msg', [
    (['missing_file1.fna', 'missing_file2.fna'], [], 'does not exist'),
    (DATASET_FILES, ['--add-prefixes', 'refseq|', 'genbank|'], 'error:'),
    (DATASET_FILES, ['--gzip-level', '0'], 'between 1 and 9'),
])
def test_parser_error_deduplicate(test_dir, inputs, params, error_msg):
    p = run_vclust(['deduplicate', '-i', *inputs, '-o',
                    test_dir / 'nr.fna', '-v', '0', *params])
    assert p.returncode == 2
    assert error_msg in p.stderr
    assert not p.stdout


@pytest.mark.parametrize('inp,params,error_msg', [
    (FASTA_DIR, ['--batch-size', '4'], 'error: --batch-size'),
    (FASTA_DIR, ['--min-ident', '95'], 'between 0 and 1'),
    (FASTA_DIR, ['--kmers-fraction', '10'], 'between 0 and 1'),
    (FASTA_DIR, ['--k', '2'], 'invalid choice'),
    ('missing_file.fna', [], 'does not exist'),
])
def test_parser_error_prefilter(test_dir, inp, params, error_msg):
    p = run_vclust(['prefilter', '-i', inp, '-o', test_dir / 'fltr.txt',
                    *params])
    assert p.returncode == 2
    assert error_msg in p.stderr
    assert not p.stdout


@pytest.mark.parametrize('inp,params,error_msg', [
    (FASTA_FILE, ['--out-tani', '40'], 'between 0 and 1'),
    ('missing_file.fna', [], 'does not exist'),
])
def test_parser_error_align(test_dir, inp, params, error_msg):
    p = run_vclust(['align', '-i', inp, '-o', test_dir / 'ani.tsv', *params])
    assert p.returncode == 2
    assert error_msg in p.stderr
    assert not p.stdout


@pytest.mark.parametrize('params,error_msg', [
    (['--metric', 'tani'], 'error: tani threshold'),
    (['--metric', 'ani', '--ani', '95'], 'between 0 and 1'),
])
def test_parser_error_cluster(test_dir, params, error_msg):
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o',
                    test_dir / 'clusters.tsv', '--ids', IDS_FILE, *params])
    assert p.returncode == 2
    assert error_msg in p.stderr
    assert not p.stdout


def test_info_exit_zero():
    p = run_vclust(['info'])
    assert p.returncode == 0
    assert 'vclust-tpu' in p.stdout
