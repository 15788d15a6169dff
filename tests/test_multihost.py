"""Multi-host distribution layer (SURVEY.md section 5.8/7; the reference
has no distributed runtime — this is the TPU-native scale-out design).

Spawns 2 REAL OS processes, each a separate jax.distributed participant
with 4 virtual CPU devices; the workers build one 8-device global mesh and
run the real mesh-sharded prefilter matmul and align group-run, asserting
bit-equality with single-process oracles (tools/multihost_worker.py).
"""
import os
import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
WORKER = REPO / 'tools' / 'multihost_worker.py'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_mesh_matches_single_process():
    port = _free_port()
    nprocs = 2
    procs = []
    for pid in range(nprocs):
        env = dict(os.environ)
        env.pop('VCLUST_TEST_TPU', None)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                            + ' --xla_force_host_platform_device_count=4')
        env['VCLUST_DIST_COORD'] = f'127.0.0.1:{port}'
        env['VCLUST_DIST_NPROCS'] = str(nprocs)
        env['VCLUST_DIST_PROCID'] = str(pid)
        env['PYTHONPATH'] = str(REPO)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f'worker {pid} failed:\n{err[-4000:]}'
        assert f'MULTIHOST_OK pid={pid}/2 devices=8' in out, out
