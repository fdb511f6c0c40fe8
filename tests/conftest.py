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
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tv.utils = types.ModuleType('torchvision.utils')
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.utils'] = tv.utils
