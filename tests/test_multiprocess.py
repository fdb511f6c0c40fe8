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


@pytest.mark.slow
def test_two_process_eval(tmp_path):
    """2-process distributed validate.py on a tiny fixture: frames split
    by rank, metrics allgathered, rank 0 writes a metrics.json covering
    ALL frames (reference DDP-validation semantics,
    `lightning_model.py:250-283,357-378`)."""
    import json
    from arah_tpu.data.fake_dataset import make_fake_zju_dataset

    root = str(tmp_path / 'data')
    # 3 frames x 1 test view = 3 items: odd count exercises the
    # ragged allgather padding/trim path
    misc_dir, _ = make_fake_zju_dataset(root, n_frames=3, views=('1', '7'),
                                        img_size=64, n_verts=256)
    out_dir = str(tmp_path / 'run')
    cfg_path = str(tmp_path / 'cfg.yaml')
    with open(cfg_path, 'w') as f:
        f.write(f"""inherit_from: configs/fake/FAKE-ZJU.yaml
data:
  path: {root}
  smpl_misc: {misc_dir}
  img_size: [64, 64]
model:
  decoder_kwargs: {{hidden_features: 64, num_hidden_layers: 2, use_FiLM: true}}
  skinning_decoder_kwargs: {{d_hidden: 64, n_layers: 2}}
  renderer_kwargs: {{d_hidden: 64, n_layers: 2, multires_view: 4}}
  n_steps: 8
  near_surface_samples: 2
  far_surface_samples: 2
training:
  out_dir: {out_dir}
""")
    worker = os.path.join(REPO, 'tests', 'eval_mp_worker.py')
    port = _free_port()
    procs = []
    for rank in range(2):
        cmd = [sys.executable, worker, cfg_path, '--novel-pose',
               '--chunk', '1024',
               '--coordinator', f'127.0.0.1:{port}',
               '--num-processes', '2', '--process-id', str(rank)]
        procs.append(subprocess.Popen(
            cmd, env=_env(2), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1500)
        outs.append(out.decode())
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'rank {rank}:\n{out[-3000:]}'

    with open(os.path.join(out_dir, 'val', 'metrics.json')) as f:
        metrics = json.load(f)
    # 3 frames x 1 test view, each evaluated exactly once
    assert len(metrics['per_frame']) == 3
    for m in metrics['per_frame']:
        assert np.isfinite(m['psnr'])
    assert np.isfinite(metrics['mean']['psnr'])
