"""Turnkey real-data parity rehearsal (VERDICT r3 next-round #7).

Real ZJU/SMPL assets are registration-gated in this sandbox, so parity
against a *trained* reference checkpoint cannot run here — but every
piece of glue it needs CAN: this test fabricates a full FLAGSHIP-shape
Lightning `last.ckpt` from the actual torch reference modules
(`im2mesh`), runs the real `convert_checkpoint.py` CLI and the real
`validate.py --novel-view` CLI against the fake ZJU fixture, and asserts

  1. the CLI-converted Orbax checkpoint restores bit-identical to an
     in-process conversion of the same torch state dict,
  2. `validate.py` renders from the converted (params-only) checkpoint
     through the standard restore path, and its saved rgb png is
     BYTE-IDENTICAL to an in-process `evaluate_frame` + `save_image` of
     the same item with the restored params.

When the gated ZJU-377 assets appear, parity day is:
  python convert_checkpoint.py --config configs/arah-zju/ZJUMOCAP-377.yaml \
      --torch-ckpt <ref last.ckpt> --out-dir out/arah-zju/377/checkpoints
  python validate.py configs/arah-zju/ZJUMOCAP-377.yaml --novel-view
(see README "Real-data parity runbook").
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = '''
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')
import runpy
sys.argv = [{cli!r}] + {args!r}
runpy.run_path({repo!r} + '/' + {cli!r}, run_name='__main__')
'''


def run_cli(cli, args, timeout=1800):
    code = RUNNER.format(repo=REPO, cli=cli, args=list(args))
    proc = subprocess.run([sys.executable, '-c', code], cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, \
        f'{cli} failed\nstdout:{proc.stdout[-2000:]}\n' \
        f'stderr:{proc.stderr[-2000:]}'
    return proc


@pytest.mark.slow
def test_convert_then_validate_pixel_identity(tmp_path):
    torch = pytest.importorskip('torch')
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    from test_pixel_parity import build_reference_modules

    # --- fake dataset fixture (2 frames x 2 views, small and hermetic)
    data_root = tmp_path / 'data'
    subprocess.run(
        [sys.executable, '-m', 'arah_tpu.data.fake_dataset', '--root',
         str(data_root), '--frames', '2', '--views', '1,7'],
        cwd=REPO, check=True, capture_output=True, timeout=600)

    # --- fabricate a FLAGSHIP-shape Lightning checkpoint from the torch
    # reference modules (exact reference state-dict key layout)
    sdf_decoder, skinning_model, color, deviation, _ = \
        build_reference_modules('flagship')
    sd = {}
    for name, m in (('sdf_decoder', sdf_decoder),
                    ('skinning_model', skinning_model),
                    ('color_decoder', color),
                    ('deviation_decoder', deviation)):
        for k, v in m.state_dict().items():
            sd[f'model.{name}.{k}'] = v
    g = torch.Generator().manual_seed(3)
    # 2 training frames + 1 novel-seq fallback row
    sd['model.latent.weight'] = torch.randn(3, 128, generator=g)
    ckpt_path = tmp_path / 'last.ckpt'
    torch.save({'state_dict': sd, 'epoch': 123}, str(ckpt_path))

    # --- config: flagship nets on the fixture
    out_dir = tmp_path / 'out'
    cfg_path = tmp_path / 'cfg.yaml'
    cfg_path.write_text(
        f"inherit_from: {REPO}/configs/fake/FAKE-ZJU-flagship.yaml\n"
        f"data:\n"
        f"  path: {data_root}\n"
        f"  smpl_misc: {data_root}/body_models/misc\n"
        f"training:\n"
        f"  out_dir: {out_dir}\n")

    # --- 1. the real converter CLI
    run_cli('convert_checkpoint.py',
            ['--config', str(cfg_path), '--torch-ckpt', str(ckpt_path),
             '--out-dir', str(out_dir / 'checkpoints')])

    # in-process conversion of the same state dict must match bit-exactly
    import jax
    from arah_tpu.config import load_config, model_config_from_cfg
    from arah_tpu.train import checkpoints as ckpt_lib
    cfg = load_config(str(cfg_path),
                      os.path.join(REPO, 'configs', 'default.yaml'))
    model_cfg = model_config_from_cfg(cfg)
    sd_np = ckpt_lib.strip_prefix(
        {k: v.numpy() for k, v in sd.items()}, 'model.')
    params_direct = ckpt_lib.convert_model_state_dict(sd_np, model_cfg)
    restored, step = ckpt_lib.restore_checkpoint(
        str(out_dir / 'checkpoints'), {'params': params_direct})
    assert step == 0
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        restored['params'], params_direct)

    # --- 2. the real validate CLI from the converted checkpoint
    proc = run_cli('validate.py',
                   [str(cfg_path), '--novel-view', '--max-frames', '1'])
    assert 'loaded checkpoint step 0' in proc.stdout, proc.stdout[-2000:]
    val_dir = out_dir / 'val'
    cli_png = (val_dir / 'rgb_000000.png').read_bytes()
    metrics = json.loads((val_dir / 'metrics.json').read_text())
    assert np.isfinite(metrics['mean']['psnr'])

    # --- 3. pixel identity: in-process evaluate_frame on the same item
    # with the restored params must reproduce the CLI's png byte-for-byte
    from arah_tpu.config.factory import get_dataset
    from arah_tpu.eval.evaluator import evaluate_frame, save_image
    dataset = get_dataset('val', cfg, subsampling_rate=30)
    item = dataset[0]
    params = restored['params']
    d_idx = int(item['inputs.data_idx'])
    latent = params['latent'][min(d_idx, params['latent'].shape[0] - 1)]
    # chunk must match the CLI's --chunk default (now the pad-aware
    # auto-chunk, chunk=None): a different chunk size compiles a
    # different program whose reassociation noise the 30x sine chain
    # amplifies into occasional one-ulp pixel diffs
    m = evaluate_frame(params, model_cfg, item, latent, chunk=None)
    ref_png_path = tmp_path / 'rgb_inproc.png'
    save_image(str(ref_png_path), m['rgb_pred'])
    assert ref_png_path.read_bytes() == cli_png, \
        'validate.py png differs from in-process render of the same ' \
        'converted weights'
    assert metrics['mean']['psnr'] == pytest.approx(float(m['psnr']),
                                                    abs=1e-3)
