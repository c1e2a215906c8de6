"""Pallas megakernel vs the XLA integrator (models/megakernel.py).

The plane-layout stage functions run identically under plain XLA
(sample_pass_ref) and inside Pallas kernels (sample_pass_pallas,
interpret mode on CPU); RNG streams match the XLA integrator bit for bit,
so images agree up to FP-boundary path divergence (Woop vs Moller-Trumbore
rounding can flip a rare hit)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hydracore3_tpu.scene import build as SB
from hydracore3_tpu.models import megakernel as MK
from hydracore3_tpu.models import integrator_pt as IPT
from hydracore3_tpu import render as R
from hydracore3_tpu.ops import rng as RNG

pytestmark = pytest.mark.heavy  # full-render compile: run via `pytest -m heavy`

CORNELL = '/root/reference/scenes/test_035/statex_00001.xml'
W, H = 64, 32


@pytest.fixture(scope='module')
def cornell():
    scene, meta = SB.load_scene(CORNELL, width=W, height=H)
    return scene, meta, MK.get_pack(scene, meta)


def _psnr(a, b):
    mse = np.mean((a - b) ** 2)
    peak = max(float(np.max(b)), 1e-9)
    return 10.0 * np.log10(peak * peak / max(mse, 1e-20))


def _inputs(n):
    pix = np.arange(n, dtype=np.int32)
    nb = n // MK.RBLK
    xy = np.stack([(pix % W).astype(np.float32), (pix // W).astype(np.float32)])
    rng0 = np.asarray(RNG.gen_init(pix))
    su = np.zeros((3, n), np.uint32)
    su[0] = rng0[:, 0]
    su[1] = rng0[:, 1]
    return (jnp.asarray(xy.reshape(2, nb, MK.S, MK.L).transpose(1, 0, 2, 3)),
            jnp.asarray(su.reshape(3, nb, MK.S, MK.L).transpose(1, 0, 2, 3)))


def test_supported(cornell):
    scene, meta, pk = cornell
    assert MK.supported(scene, meta)
    assert not pk.tex_const  # test_035 has a real 256x256 texture


def test_pallas_matches_xla_oracle(cornell):
    """The kernel pipeline must reproduce the stage-chain exactly (same
    code, same precision) — any mismatch is a packing/layout bug."""
    scene, meta, pk = cornell
    n = W * H
    xy, su = _inputs(n)
    c_pl, su_pl = MK.sample_pass_pallas(pk, xy, None, su, meta.trace_depth,
                                        MK.INTEGRATOR_MIS_PT, interpret=True)
    # flat planes for the oracle
    pix = np.arange(n, dtype=np.int32)
    sb = n // MK.L
    xsp = jnp.asarray((pix % W).astype(np.float32).reshape(sb, MK.L))
    ysp = jnp.asarray((pix // W).astype(np.float32).reshape(sb, MK.L))
    rng0 = np.asarray(RNG.gen_init(pix))
    rx = jnp.asarray(rng0[:, 0].reshape(sb, MK.L))
    ry = jnp.asarray(rng0[:, 1].reshape(sb, MK.L))
    c_rf, rx2, ry2 = MK.sample_pass_ref(pk, xsp, ysp, rx, ry,
                                        meta.trace_depth,
                                        MK.INTEGRATOR_MIS_PT)
    a = np.asarray(c_pl).transpose(1, 0, 2, 3).reshape(4, -1)
    b = np.asarray(c_rf).reshape(4, -1)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # rng streams bit-identical
    rng_pl = np.asarray(su_pl).transpose(1, 0, 2, 3).reshape(3, -1)[0]
    assert (rng_pl == np.asarray(rx2).reshape(-1)).all()


@pytest.mark.parametrize('integrator', ['mispt', 'shadowpt', 'naivept'])
def test_render_matches_integrator(cornell, integrator):
    """Full-frame megakernel render vs the XLA path at equal spp: same RNG
    -> near-identical Monte Carlo estimate (PSNR-level agreement; rare
    FP-boundary path splits keep it from being bit-equal)."""
    scene, meta, _ = cornell
    spp = 4
    img_mk = MK.render(scene, meta, spp=spp, integrator=integrator)
    os.environ['HYDRA_MEGAKERNEL'] = '0'
    try:
        img_ref = R.render(scene, meta, spp=spp, integrator=integrator)
    finally:
        os.environ.pop('HYDRA_MEGAKERNEL', None)
    psnr = _psnr(img_mk[..., :3], img_ref[..., :3])
    assert psnr > 45.0, psnr


def test_render_dispatch_selects_megakernel(cornell):
    """render.render() auto-routes eligible scenes to the megakernel and
    both paths converge to the same image."""
    scene, meta, _ = cornell
    os.environ['HYDRA_MEGAKERNEL'] = '1'  # off-TPU routing is opt-in
    try:
        img_auto = R.render(scene, meta, spp=2, integrator='mispt')
    finally:
        os.environ.pop('HYDRA_MEGAKERNEL', None)
    img_mk = MK.render(scene, meta, spp=2, integrator='mispt')
    np.testing.assert_allclose(img_auto, img_mk, atol=1e-6)


def test_matid_lightid_exact(cornell):
    """The one-hot shade-row matmul must fetch integer matId/lightId
    EXACTLY (f32-emulation passes are lossless for one-hot selects)."""
    scene, meta, pk = cornell
    n = MK.RBLK
    xy, su = _inputs(n)
    ks, call = MK._build_kernels(meta.trace_depth, MK.INTEGRATOR_MIS_PT,
                                 not pk.tex_const, n // MK.RBLK, pk.n_tris,
                                 int(pk.quad_rows.shape[0]), True)
    base = [pk.consts, pk.wx, pk.wy, pk.wz, pk.shade_t, pk.mat_lane]
    r = call(ks['first'], base + [pk.tex_lane], [xy, su], n)
    sf, su2 = r[0], r[1]
    mid = np.asarray(su2)[:, MK.SU_FLAGS].astype(np.int64) & 0x00FFFFFF
    dead = (np.asarray(su2)[:, MK.SU_FLAGS].astype(np.int64) & 0x80000000) != 0
    assert mid[~dead].max() < meta.num_materials
    lgt = np.asarray(sf)[:, MK.SF_HITLGT]
    assert np.all(lgt == np.round(lgt))


def test_whole_kernel_const_tex(cornell):
    """Const-texture scenes run the whole sample as ONE kernel (no tap
    boundaries); must match the stage-chain oracle exactly."""
    import dataclasses
    scene, meta, _ = cornell
    meta2 = dataclasses.replace(meta, tex0_all_const=True)
    scene2 = dataclasses.replace(
        scene, mat_tex0_const=jnp.ones((meta.num_materials, 4), jnp.float32))
    pk2 = MK.pack(scene2, meta2)
    assert pk2.tex_const
    n = W * H
    xy, su = _inputs(n)
    c_pl, su_pl = MK.sample_pass_pallas(pk2, xy, None, su, meta.trace_depth,
                                        MK.INTEGRATOR_MIS_PT, interpret=True)
    pix = np.arange(n, dtype=np.int32)
    sb = n // MK.L
    xsp = jnp.asarray((pix % W).astype(np.float32).reshape(sb, MK.L))
    ysp = jnp.asarray((pix // W).astype(np.float32).reshape(sb, MK.L))
    rng0 = np.asarray(RNG.gen_init(pix))
    rx = jnp.asarray(rng0[:, 0].reshape(sb, MK.L))
    ry = jnp.asarray(rng0[:, 1].reshape(sb, MK.L))
    c_rf, rx2, _ = MK.sample_pass_ref(pk2, xsp, ysp, rx, ry, meta.trace_depth,
                                      MK.INTEGRATOR_MIS_PT)
    a = np.asarray(c_pl).transpose(1, 0, 2, 3).reshape(4, -1)
    b = np.asarray(c_rf).reshape(4, -1)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_conductor_matches_integrator(cornell):
    """Rough + smooth conductor through the megakernel vs the XLA path
    (cmat_conductor.h port in plane form, incl. the real-arithmetic
    complex Fresnel)."""
    import dataclasses
    scene, meta, _ = cornell
    pf = np.asarray(scene.mat_packed_f32).copy()
    pi = np.asarray(scene.mat_packed_i32).copy()
    from hydracore3_tpu.scene.build import MAT_TYPE_CONDUCTOR
    # mat 2 -> rough conductor, mat 3 -> smooth mirror conductor
    for mid, rough in ((2, 0.3), (3, 0.0)):
        pi[mid, 0] = MAT_TYPE_CONDUCTOR
        pf[mid, 64] = float(MAT_TYPE_CONDUCTOR)
        pf[mid, 48 + 0] = rough           # ROUGH_U
        pf[mid, 48 + 1] = rough           # ROUGH_V
        pf[mid, 48 + 2] = 1.5             # ETA
        pf[mid, 48 + 3] = 2.0             # K
        pf[mid, 0:4] = (0.9, 0.8, 0.7, 0.0)  # CONDUCTOR_COLOR
        pi[mid, 8:12] = -1                # no SPDs
        pf[mid, 72:76] = -1.0
    scene2 = dataclasses.replace(scene,
                                 mat_packed_f32=jnp.asarray(pf),
                                 mat_packed_i32=jnp.asarray(pi))
    meta2 = dataclasses.replace(
        meta, mat_types_present=tuple(sorted(set(meta.mat_types_present)
                                             | {MAT_TYPE_CONDUCTOR})))
    assert MK.supported(scene2, meta2)
    img_mk = MK.render(scene2, meta2, spp=4, integrator='mispt')
    os.environ['HYDRA_MEGAKERNEL'] = '0'
    try:
        img_ref = R.render(scene2, meta2, spp=4, integrator='mispt')
    finally:
        os.environ.pop('HYDRA_MEGAKERNEL', None)
    psnr = _psnr(img_mk[..., :3], img_ref[..., :3])
    assert psnr > 45.0, psnr
