"""Whitted RT + G-buffer tests on the Cornell scene."""
import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy  # full-render compile: run via `pytest -m heavy`


def test_cast_single_ray(cornell_scene):
    from hydracore3_tpu.models import integrator_rt as IRT
    scene, meta = cornell_scene
    N = meta.width * meta.height
    pix = jnp.arange(N, dtype=jnp.int32)
    color = np.asarray(IRT.cast_single_ray(scene, meta, pix)).reshape(
        meta.height, meta.width, 4)
    assert np.isfinite(color).all()
    assert color[..., :3].max() > 0.1     # something visible
    h, w = color.shape[:2]
    center = color[h // 2, w // 2, :3]
    assert center.sum() > 0               # cube or back wall at image center


def test_whitted_raytrace(cornell_scene):
    from hydracore3_tpu.models import integrator_rt as IRT
    scene, meta = cornell_scene
    N = meta.width * meta.height
    pix = jnp.arange(N, dtype=jnp.int32)
    img = np.asarray(IRT.ray_trace(scene, meta, pix)).reshape(
        meta.height, meta.width, 4)
    assert np.isfinite(img).all()
    # note: like the reference (integrator_rt.cpp:261), Whitted uses
    # light.intensity WITHOUT the multiplier, so this scene renders dim
    assert img[..., :3].max() > 0.005     # direct lighting visible
    assert (img[..., :3] > 0).any()


def test_gbuffer(cornell_scene):
    from hydracore3_tpu.models import gbuffer as GB
    scene, meta = cornell_scene
    N = meta.width * meta.height
    pix = jnp.arange(N, dtype=jnp.int32)
    gb = GB.eval_gbuffer(scene, meta, pix)
    depth = np.asarray(gb.depth).reshape(meta.height, meta.width)
    inst = np.asarray(gb.inst_id).reshape(meta.height, meta.width)
    cov = np.asarray(gb.coverage)
    assert np.isfinite(depth).all()
    assert depth.max() > 5.0              # box is ~15 units away
    assert (inst >= 0).mean() > 0.3       # most pixels hit something
    assert (cov >= 0).all() and (cov <= 1.0 + 1e-5).all()
    # normals normalized where hit
    nrm = np.asarray(gb.norm)
    ln = np.linalg.norm(nrm, axis=-1)
    assert np.all(ln[np.asarray(gb.inst_id) >= 0] > 0.9)
