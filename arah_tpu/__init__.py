"""arah_tpu: a TPU-native framework for ARAH-style animatable human avatars.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference `taconite/arah-release`:

  * hypernetwork-conditioned SIREN SDF + IDR-style color MLP,
  * forward-LBS skinning network with Broyden joint root-finding of
    ray-surface intersections in canonical space,
  * VolSDF volume rendering,
  * SMPL body model + pose/camera refinement,
  * data pipelines (ZJU-MoCap / H36M / People-Snapshot / AIST++ ODP),
  * a multi-chip trainer sharding rays over a `jax.sharding.Mesh`.

Layout:
  core/      pure-JAX math (SMPL LBS, canonical transforms, rays, PE)
  nn/        functional network modules with explicit param pytrees
  solver/    batched Broyden + root-finding (canonical corr, iso-surface)
  render/    sphere tracing, ray sampling, VolSDF compositing, full renderer
  ops/       TPU kernels (Pallas) + device KNN
  parallel/  mesh/sharding helpers, data-parallel train step
  train/     losses, optimizers, checkpointing, training loop
  data/      host-side dataset pipelines + synthetic assets
  utils/     metrics, meshing, misc
  native/    C++ host ops (point-in-mesh, point-mesh distance, marching cubes)
"""

__version__ = "0.1.0"
