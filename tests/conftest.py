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

import pytest

REF_SCENES = pathlib.Path('/root/reference/scenes')


@pytest.fixture(scope='session')
def cornell_scene():
    from hydracore3_tpu.scene import build as SB
    return SB.load_scene(str(REF_SCENES / 'test_035/statex_00001.xml'),
                         width=64, height=48)
