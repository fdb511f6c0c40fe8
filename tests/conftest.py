"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding tests run against this fake mesh
(`--xla_force_host_platform_device_count=8`), which the reference could
never do (DDP requires real GPUs).
"""
import os

# The sandbox boots with an 'axon' TPU PJRT plugin that overrides
# JAX_PLATFORMS; jax.config.update after import is the reliable way to
# pin tests to the virtual CPU mesh.
flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
# float32 matmuls for golden-value comparisons
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest


@pytest.fixture(scope='session')
def rng():
    import numpy as np
    return np.random.RandomState(0)


def reference_available() -> bool:
    return os.path.isdir('/root/reference')


def add_reference_path():
    import sys
    import types
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    # The vendored reference code imports torchvision at module scope but
    # never uses it on the paths we test; stub it out.
    for stub in ('torchvision', 'torchvision.utils', 'plyfile', 'skimage',
                 'skimage.measure', 'lpips', 'pytorch3d', 'pytorch3d.ops'):
        if stub not in sys.modules:
            mod = types.ModuleType(stub)
            if '.' in stub:
                parent, child = stub.rsplit('.', 1)
                setattr(sys.modules.get(parent, mod), child, mod)
            sys.modules[stub] = mod
    # functional KNN shim so the reference ray tracer runs on CPU
    ops = sys.modules['pytorch3d.ops']
    if not hasattr(ops, 'knn_points'):
        import collections
        import torch as _torch
        KNN = collections.namedtuple('KNN', ['dists', 'idx'])

        def knn_points(p, v, K=1, **kwargs):
            d = _torch.cdist(p, v)
            dists, idx = _torch.topk(d, K, dim=-1, largest=False)
            return KNN(dists=dists ** 2, idx=idx)

        ops.knn_points = knn_points
        sys.modules['pytorch3d'].ops = ops
    # Install namespace-package stubs so reference submodules import without
    # executing heavyweight package __init__ files (torchmeta pulls in
    # torchvision datasets; im2mesh pulls in cv2-bound data code).
    for pkg_name, path in (
            ('torchmeta', '/root/reference/torchmeta'),
            ('im2mesh', '/root/reference/im2mesh'),
            ('im2mesh.metaavatar_render',
             '/root/reference/im2mesh/metaavatar_render')):
        if pkg_name not in sys.modules:
            pkg = types.ModuleType(pkg_name)
            pkg.__path__ = [path]
            sys.modules[pkg_name] = pkg


def load_ref_siren_modules():
    """Import the reference SIREN/hypernet stack with stubbed packages."""
    add_reference_path()
    import importlib
    # import decoder first: the reference has a circular import between
    # hyperlayers and siren_modules that only resolves in this order
    importlib.import_module('im2mesh.metaavatar.models.decoder')
    hyperlayers = importlib.import_module('im2mesh.hyperlayers')
    siren = importlib.import_module('im2mesh.metaavatar.models.siren_modules')
    return siren, hyperlayers
