"""Cluster stage tests. The golden clusters.tsv (produced with
--metric tani --tani 0.95 on the golden ani.tsv) is the membership oracle;
other algorithms are smoke-tested per the reference strategy
(reference test.py:591-722)."""

import pytest

from conftest import run_vclust, ANI_FILE, IDS_FILE, GOLD_DIR

ALGOS = ['single', 'complete', 'uclust', 'cd-hit', 'set-cover', 'leiden']


def test_cluster_single_golden_parity(test_dir):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--metric', 'tani', '--tani', '0.95', '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert out.read_text() == (GOLD_DIR / 'clusters.tsv').read_text()


@pytest.mark.parametrize('algorithm', ALGOS)
def test_cluster_algorithms_smoke(test_dir, algorithm):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--algorithm', algorithm, '--metric', 'tani',
                    '--tani', '0.95', '-v', '0'])
    assert p.returncode == 0, p.stderr
    lines = out.read_text().splitlines()
    assert lines[0] == 'object\tcluster'
    assert len(lines) == 13   # 12 objects + header
    # NC_010807's four variants always co-cluster at tani >= 0.95.
    labels = {t.split('\t')[0]: t.split('\t')[1] for t in lines[1:]}
    group = {labels[n] for n in ['NC_010807', 'NC_010807.alt1',
                                 'NC_010807.alt2', 'NC_010807.alt3']}
    assert len(group) == 1


def test_cluster_representatives(test_dir):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--metric', 'tani', '--tani', '0.95', '-r', '-v', '0'])
    assert p.returncode == 0, p.stderr
    lines = out.read_text().splitlines()[1:]
    labels = {t.split('\t')[0]: t.split('\t')[1] for t in lines}
    # Representative of the NC_010807 group = longest member (alt2).
    assert labels['NC_010807'] == 'NC_010807.alt2'
    # Singletons represent themselves.
    assert labels['NC_025457.alt2'] == 'NC_025457.alt2'


@pytest.mark.parametrize('measure', ['tani', 'gani', 'ani'])
def test_cluster_metrics(test_dir, measure):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--metric', measure, f'--{measure}', '0.95', '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert out.stat().st_size


def test_cluster_edge_filters(test_dir):
    out1 = test_dir / 'c1.tsv'
    out2 = test_dir / 'c2.tsv'
    for out, extra in [(out1, []), (out2, ['--qcov', '0.95'])]:
        p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids',
                        IDS_FILE, '--metric', 'tani', '--tani', '0.8',
                        '-v', '0', *extra])
        assert p.returncode == 0, p.stderr

    def n_clusters(path):
        return len({line.split('\t')[1]
                    for line in path.read_text().splitlines()[1:]})
    # The coverage filter can only remove edges -> same or more clusters.
    assert n_clusters(out2) >= n_clusters(out1)


def test_cluster_num_alns_max_filter(test_dir):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--metric', 'tani', '--tani', '0.8',
                    '--num_alns', '10', '-v', '0'])
    assert p.returncode == 0, p.stderr
    assert out.stat().st_size


@pytest.mark.parametrize('params', [
    ['--leiden-resolution', '1.0'],
    ['--leiden-beta', '0.05'],
    ['--leiden-iterations', '3'],
])
def test_cluster_leiden_params(test_dir, params):
    out = test_dir / 'clusters.tsv'
    p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids', IDS_FILE,
                    '--algorithm', 'leiden', '--metric', 'tani',
                    '--tani', '0.7', '-v', '0', *params])
    assert p.returncode == 0, p.stderr
    assert out.stat().st_size


def test_cluster_deterministic(test_dir):
    outs = []
    for name in ('a.tsv', 'b.tsv'):
        out = test_dir / name
        p = run_vclust(['cluster', '-i', ANI_FILE, '-o', out, '--ids',
                        IDS_FILE, '--algorithm', 'leiden', '--metric',
                        'tani', '--tani', '0.7', '-v', '0'])
        assert p.returncode == 0
        outs.append(out.read_text())
    assert outs[0] == outs[1]
