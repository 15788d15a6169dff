"""End-to-end workflow tests: prefilter -> align --filter -> cluster
(reference test.py:551-588)."""

from conftest import run_vclust, FASTA_FILE, GOLD_DIR


def test_full_workflow(test_dir):
    fltr = test_dir / 'fltr.txt'
    ani = test_dir / 'ani.tsv'
    ids = test_dir / 'ani.ids.tsv'
    clusters = test_dir / 'clusters.tsv'

    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', fltr, '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert fltr.read_text() == (GOLD_DIR / 'fltr.txt').read_text()

    p = run_vclust(['align', '-i', FASTA_FILE, '-o', ani, '--filter', fltr,
                    '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert ani.stat().st_size and ids.stat().st_size
    with open(ani) as fh:
        n_rows = sum(1 for _ in fh) - 1
    # 13 candidate pairs from the prefilter -> 26 directed rows.
    assert n_rows == 26

    p = run_vclust(['cluster', '-i', ani, '-o', clusters, '--ids', ids,
                    '--metric', 'tani', '--tani', '0.95', '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert clusters.read_text() == (GOLD_DIR / 'clusters.tsv').read_text()


def test_workflow_filter_threshold(test_dir):
    fltr = test_dir / 'fltr.txt'
    ani = test_dir / 'ani.tsv'
    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', fltr, '-v', '0'])
    assert p.returncode == 0
    p = run_vclust(['align', '-i', FASTA_FILE, '-o', ani, '--filter', fltr,
                    '--filter-threshold', '0.99', '-v', '0'])
    assert p.returncode == 0, p.stderr
    with open(ani) as fh:
        n_rows = sum(1 for _ in fh) - 1
    assert 0 < n_rows < 26


def test_full_workflow_tpu_engine(test_dir):
    """The pipeline with the TPU align engine lands on the byte-identical
    golden clusters.tsv: the engine's measures are within tolerance of the
    exact engine everywhere it matters for the tani-0.95 decision."""
    fltr = test_dir / 'fltr.txt'
    ani = test_dir / 'ani.tsv'
    ids = test_dir / 'ani.ids.tsv'
    clusters = test_dir / 'clusters.tsv'

    p = run_vclust(['prefilter', '-i', FASTA_FILE, '-o', fltr, '-v', '0'])
    assert p.returncode == 0, p.stderr
    p = run_vclust(['align', '-i', FASTA_FILE, '-o', ani, '--filter', fltr,
                    '--filter-threshold', '0.7', '--engine', 'tpu',
                    '-v', '0'])
    assert p.returncode == 0, p.stderr
    p = run_vclust(['cluster', '-i', ani, '--ids', ids, '-o', clusters,
                    '--metric', 'tani', '--tani', '0.95', '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert clusters.read_text() == (GOLD_DIR / 'clusters.tsv').read_text()
