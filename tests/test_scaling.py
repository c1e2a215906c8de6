"""Multi-device sharding: determinism across device counts + the scaling
harness (SURVEY §2.5 distributed backend; BASELINE scaling-efficiency
metric is measured by parallel.mesh.scaling_report on real hardware)."""
import jax
import numpy as np
import pytest

from hydracore3_tpu.scene import build as SB
from hydracore3_tpu.parallel import mesh as M

CORNELL = '/root/reference/scenes/test_035/statex_00001.xml'


@pytest.fixture(scope='module')
def tiny_scene():
    return SB.load_scene(CORNELL, width=32, height=32)


def test_image_invariant_to_device_count(tiny_scene):
    """The per-pixel counter-keyed RNG makes the image BITWISE identical
    for any sharding (P7: thread-id->RNG mapping is sharding-invariant)."""
    scene, meta = tiny_scene
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    img1 = M.render_sharded(M.make_mesh(jax.devices()[:1]), scene, meta, spp=2)
    img8 = M.render_sharded(M.make_mesh(jax.devices()[:8]), scene, meta, spp=2)
    np.testing.assert_array_equal(img1, img8)


def test_scaling_report_runs(tiny_scene):
    scene, meta = tiny_scene
    rows = M.scaling_report(scene, meta, spp=1,
                            device_counts=[1, min(8, len(jax.devices()))],
                            verbose=False)
    assert rows[0]['devices'] == 1
    assert all(r['msamples_s'] > 0 for r in rows)
    # weak scaling on a shared-core virtual mesh: total throughput should
    # hold roughly constant (sharding adds no overhead on fixed physical
    # compute); this is the CPU-mesh analog of the >=80% hardware target
    assert rows[-1]['overhead_efficiency'] > 0.5
