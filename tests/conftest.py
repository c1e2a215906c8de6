"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU plugin in every process; tests
run on CPU (deterministic, no remote compile) with 8 virtual devices so the
multi-chip sharding paths are exercised without hardware (SURVEY.md §4).
This must run before jax is imported anywhere.
"""
import os

os.environ['PALLAS_AXON_POOL_IPS'] = ''
os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# The axon sitecustomize registers the TPU plugin at interpreter startup,
# BEFORE this conftest runs, and pins jax_platforms to 'axon' — env vars set
# here are too late.  jax.config.update still wins if called before backend
# initialization, so force it explicitly or every "CPU" test silently runs
# over the remote TPU tunnel (~100x slower per dispatch).
import jax

jax.config.update('jax_platforms', 'cpu')

# persistent compilation cache: the big jitted render programs take ~20s
# each to compile on CPU; cache them across pytest runs
jax.config.update('jax_compilation_cache_dir', '/tmp/hydracore3_jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)

import pytest


def box_downsample(img, k=4):
    """Box-filter downsample for MC-noise-tolerant image comparisons."""
    import numpy as np
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    img = img[:h, :w]
    return np.asarray(img).reshape(h // k, k, w // k, k, -1).mean((1, 3))

REF_SCENES = pathlib.Path('/root/reference/scenes')


@pytest.fixture(scope='session')
def cornell_scene():
    from hydracore3_tpu.scene import build as SB
    return SB.load_scene(str(REF_SCENES / 'test_035/statex_00001.xml'),
                         width=64, height=48)
