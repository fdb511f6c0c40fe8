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


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: compile-heavy test (deselect with -m "not slow")')


_DEFAULT_TIMEOUT = 900  # generous: first-compile of the renderer is slow


def pytest_addoption(parser):
    parser.addoption('--test-timeout', type=int, default=_DEFAULT_TIMEOUT,
                     help='per-test timeout in seconds (0 = off)')


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    """Per-test watchdog so a deadlock FAILS instead of hanging CI:
    SIGALRM raises TimeoutError at T; faulthandler dumps all threads and
    hard-kills at T+120 if the main thread is stuck in C (the XLA:CPU
    futex-wait failure mode)."""
    import faulthandler
    import signal
    timeout = item.config.getoption('--test-timeout')
    marker = item.get_closest_marker('timeout')
    if marker is not None and marker.args:
        timeout = int(marker.args[0])
    if timeout <= 0 or threading_main() is False:
        return (yield)

    def on_alarm(signum, frame):
        raise TimeoutError(
            f'test exceeded {timeout}s watchdog (see conftest.py)')

    faulthandler.dump_traceback_later(timeout + 120, exit=True)
    old = signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
        faulthandler.cancel_dump_traceback_later()


def threading_main() -> bool:
    import threading
    return threading.current_thread() is threading.main_thread()


@pytest.fixture()
def rng(request):
    """Per-test deterministic RandomState.

    Was session-scoped (one shared mutable stream), which made every
    test's draws depend on which tests ran before it — the round-2
    TestIsoKernel flake (agreement 0.9375 vs 0.94 in suite order, pass
    alone) was exactly this. Seeding from a stable hash of the test id
    makes each test's scene identical in ANY order, including alone.
    """
    import zlib
    import numpy as np
    seed = zlib.crc32(request.node.nodeid.encode()) & 0x7fffffff
    return np.random.RandomState(seed)


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
