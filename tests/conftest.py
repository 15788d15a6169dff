import os
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
# Parity corpus: vendored in-repo (the reference ships it the same way,
# reference MANIFEST.in:3-4); fall back to the reference checkout only if
# the vendored copy is missing.
REFERENCE_EXAMPLE = REPO / 'example'
if not REFERENCE_EXAMPLE.exists():  # pragma: no cover
    REFERENCE_EXAMPLE = pathlib.Path('/root/reference/example')

# Tests run JAX on CPU with a virtual 8-device mesh so sharding paths are
# exercised without TPU hardware (SURVEY.md section 7; driver validates the
# real multi-chip path separately via __graft_entry__.dryrun_multichip).
# Forced (not setdefault): the CI/driver environment pre-sets
# JAX_PLATFORMS to the TPU plugin via a sitecustomize hook that wins over
# the env var, so the platform is pinned through jax.config after import.
# Opt back into the real device with VCLUST_TEST_TPU=1.
if not os.environ.get('VCLUST_TEST_TPU'):
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=8')
    try:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    except ImportError:
        pass

VCLUST = REPO / 'vclust.py'

DATA_DIR = REFERENCE_EXAMPLE
FASTA_DIR = DATA_DIR / 'fna'
FASTA_FILE = DATA_DIR / 'multifasta.fna'
FASTAGZ_FILE = DATA_DIR / 'multifasta.fna.gz'
GOLD_DIR = DATA_DIR / 'output'
ANI_FILE = GOLD_DIR / 'ani.tsv'
ALN_FILE = GOLD_DIR / 'ani.aln.tsv'
IDS_FILE = GOLD_DIR / 'ani.ids.tsv'
FLTR_FILE = GOLD_DIR / 'fltr.txt'
DATASET_DIR = DATA_DIR / 'datasets'
DATASET_FILES = [
    DATASET_DIR / 'refseq.fna',
    DATASET_DIR / 'genbank.fna',
    DATASET_DIR / 'other.fna',
]


class _Result:
    def __init__(self, returncode, stdout, stderr):
        self.returncode = returncode
        self.stdout = stdout
        self.stderr = stderr


def run_vclust(args, **kwargs):
    """Run the CLI. Default: in-process (python startup is seconds on the
    CI host); set VCLUST_TEST_SUBPROCESS=1 for true subprocess black-box
    runs (same assertions pass either way)."""
    if os.environ.get('VCLUST_TEST_SUBPROCESS'):
        env = dict(os.environ)
        env.setdefault('PYTHONPATH', str(REPO))
        return subprocess.run(
            [sys.executable, str(VCLUST), *[str(a) for a in args]],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, **kwargs)
    import contextlib
    import io
    sys.path.insert(0, str(REPO))
    from vclust_tpu.cli import main
    out, err = io.StringIO(), io.StringIO()
    code = 0
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        try:
            main([str(a) for a in args])
        except SystemExit as exc:
            code = int(exc.code or 0)
    return _Result(code, out.getvalue(), err.getvalue())


@pytest.fixture
def test_dir(tmp_path):
    return tmp_path


@pytest.fixture(scope='session')
def align_result(tmp_path_factory):
    """Full all-vs-all align over the 12-genome example, run once."""
    out = tmp_path_factory.mktemp('align')
    p = run_vclust(['align', '-i', FASTA_FILE, '-o', out / 'ani.tsv',
                    '--out-aln', out / 'ani.aln.tsv', '--outfmt', 'complete'])
    assert p.returncode == 0, p.stderr
    return out
