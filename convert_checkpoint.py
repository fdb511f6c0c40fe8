#!/usr/bin/env python
"""Convert a reference (taconite/arah-release) PyTorch checkpoint into an
arah_tpu Orbax checkpoint.

Usage:
  python convert_checkpoint.py --config configs/arah-zju/ZJUMOCAP-313.yaml \
      --torch-ckpt out/.../checkpoints/last.ckpt --out-dir out/converted

Supports full ARAH Lightning checkpoints; pretrained MetaAvatar /
SNARF bootstraps are converted at train start by the factory
(`arah_tpu/config/factory.py`).
"""
import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--torch-ckpt', required=True)
    p.add_argument('--out-dir', required=True)
    args = p.parse_args()

    import jax.numpy as jnp
    from arah_tpu.config import load_config, model_config_from_cfg
    from arah_tpu.train import checkpoints as ckpt_lib

    cfg = load_config(args.config, 'configs/default.yaml')
    model_cfg = model_config_from_cfg(cfg)

    sd = ckpt_lib.load_torch_checkpoint(args.torch_ckpt)
    sd = ckpt_lib.strip_prefix(sd, 'model.')
    params = ckpt_lib.convert_model_state_dict(sd, model_cfg)

    os.makedirs(args.out_dir, exist_ok=True)
    path = ckpt_lib.save_checkpoint(args.out_dir, 0, {'params': params})
    print('wrote', path)


if __name__ == '__main__':
    main()
