"""Multi-process data parallelism: 2 processes x 4 virtual CPU devices.

Validates the full multi-host wiring (jax.distributed init, global mesh,
`make_global_batch` per-process batch assembly, cross-process gradient
psum inside the sharded step) against the reference's DDP grad-sync
semantics (`/root/reference/train.py:124-133`): after two optimizer
steps, params must agree across ranks AND match a single-process run on
the identical 8-device global batch.
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'mp_worker.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def _env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['XLA_FLAGS'] = (
        f'--xla_force_host_platform_device_count={n_local_devices}')
    # independent processes must not share a compilation-cache lockfile
    env.pop('JAX_COMPILATION_CACHE_DIR', None)
    return env


def _run_workers(tmp, nprocs, n_local, flagship=False, timeout=900):
    port = _free_port()
    procs = []
    for rank in range(nprocs):
        cmd = [sys.executable, WORKER, '--rank', str(rank),
               '--nprocs', str(nprocs),
               '--coordinator', f'127.0.0.1:{port}',
               '--outdir', str(tmp)]
        if flagship:
            cmd.append('--flagship')
        procs.append(subprocess.Popen(
            cmd, env=_env(n_local), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    fail = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        if p.returncode != 0:
            fail.append(f'--- rank {rank} (rc={p.returncode}) ---\n'
                        + out.decode(errors="replace")[-4000:])
    assert not fail, '\n'.join(fail)
    return [dict(np.load(os.path.join(tmp, f'rank{r}.npz')))
            for r in range(nprocs)]


def _run_single(tmp, flagship=False, timeout=900):
    cmd = [sys.executable, WORKER, '--nprocs', '1', '--outdir', str(tmp)]
    if flagship:
        cmd.append('--flagship')
    out = subprocess.run(cmd, env=_env(8), cwd=REPO, timeout=timeout,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    assert out.returncode == 0, out.stdout.decode(errors='replace')[-4000:]
    return dict(np.load(os.path.join(tmp, 'rank0.npz')))


def _assert_close(a: dict, b: dict, rtol: float, what: str):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            a[k], b[k], rtol=rtol, atol=1e-8,
            err_msg=f'{what}: fingerprint {k} diverged')


@pytest.mark.slow
@pytest.mark.timeout(1200)
def test_two_process_grad_sync(tmp_path):
    """2 procs x 4 devices == 1 proc x 8 devices, params synced."""
    mp_dir = tmp_path / 'mp'
    sp_dir = tmp_path / 'sp'
    fps = _run_workers(mp_dir, nprocs=2, n_local=4)
    # ranks computed the same replicated params (cross-process psum)
    _assert_close(fps[0], fps[1], rtol=1e-6, what='rank0 vs rank1')
    # and they match the single-process oracle on the same global batch
    sp = _run_single(sp_dir)
    _assert_close(fps[0], sp, rtol=1e-4, what='multi vs single process')
