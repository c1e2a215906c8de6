"""Megakernel spectral helpers vs the ops/spectrum reference (smoke tier).

The heavy tier proves image-level parity; these pin the chunked-lane-
gather SPD/CIE fetches and the in-kernel spectrum->RGB conversion against
their XLA twins directly, so a packing or axis regression (e.g. the
lane_gather axis bug the r5 regen-finalize path hit) fails in seconds.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from hydracore3_tpu.models import megakernel as MK
from hydracore3_tpu.ops import spectrum as SPEC
from hydracore3_tpu.bsdf import common as C

S, L = MK.S, MK.L
N = S * L


def test_sample_wavelengths_plane_matches():
    u = np.random.default_rng(1).uniform(0, 1, N).astype(np.float32)
    mine = np.asarray(MK.sample_wavelengths_plane(
        jnp.asarray(u.reshape(S, L))))            # [4,S,L]
    ref = np.asarray(SPEC.sample_wavelengths(jnp.asarray(u)))  # [N,4]
    np.testing.assert_allclose(mine.reshape(4, N).T, ref, rtol=1e-6)


def _toy_spd_pack(rng, n_spd):
    """Flat spec_values + offsets, and the [NS+3,4,128] chunk table the
    megakernel pack() builds from them (same construction)."""
    sv = rng.uniform(0, 2, n_spd * 471).astype(np.float32)
    offs = (np.arange(n_spd) * 471).astype(np.int32)
    tab = np.zeros((n_spd + 3, 4, 128), np.float32)
    for s in range(n_spd):
        idx = np.minimum(offs[s] + np.arange(512), len(sv) - 1)
        tab[s] = sv[idx].reshape(4, 128)
    cie = SPEC.cie_xyz_table()
    for c in range(3):
        row = np.zeros(512, np.float32)
        row[:471] = cie[:, c]
        tab[n_spd + c] = row.reshape(4, 128)
    return jnp.asarray(sv), jnp.asarray(offs), jnp.asarray(tab)


def test_spd_sample_matches_sample_uniform_spectrum():
    rng = np.random.default_rng(7)
    sv, offs, tab = _toy_spd_pack(rng, 5)
    lam = rng.uniform(350, 840, N).astype(np.float32)   # incl. out-of-range
    sid = rng.integers(0, 5, N).astype(np.int32)
    mine = np.asarray(MK.spd_sample(tab, (0, 1, 2, 3, 4),
                                    jnp.asarray(sid.reshape(S, L)),
                                    jnp.asarray(lam.reshape(S, L))))
    ref = np.asarray(SPEC.sample_uniform_spectrum(
        sv, offs[jnp.asarray(sid)],
        jnp.asarray(lam[:, None].repeat(4, 1))))[:, 0]
    np.testing.assert_allclose(mine.reshape(N), ref, rtol=1e-6)
    # candidate-set DCE: ids outside the static set contribute 0
    part = np.asarray(MK.spd_sample(tab, (2,),
                                    jnp.asarray(sid.reshape(S, L)),
                                    jnp.asarray(lam.reshape(S, L)))).reshape(N)
    np.testing.assert_allclose(part[sid == 2], ref[sid == 2], rtol=1e-6)
    assert (part[sid != 2] == 0).all()


def test_spectral_contrib_matches_spectrum_to_xyz():
    rng = np.random.default_rng(9)
    _, _, tab = _toy_spd_pack(rng, 2)
    lam = rng.uniform(360, 830, (4, N)).astype(np.float32)
    spec_acc = rng.uniform(0, 3, (4, N)).astype(np.float32)
    tw = rng.integers(0, 2, N).astype(bool)
    st = dict(lam=jnp.asarray(lam.reshape(4, S, L)),
              flags=jnp.asarray(np.where(
                  tw, C.RAY_FLAG_WAVES_DIVERGED, 0).astype(np.uint32)
                  .reshape(S, L)))
    mine = np.asarray(MK.spectral_contrib(
        (tab, None), st, jnp.asarray(spec_acc.reshape(4, S, L))))
    xyz = SPEC.spectrum_to_xyz(jnp.asarray(spec_acc.T), jnp.asarray(lam.T),
                               jnp.asarray(SPEC.cie_xyz_table()),
                               jnp.asarray(tw))
    rgb = np.asarray(SPEC.xyz_to_rgb(xyz))
    got = mine.reshape(4, N).T
    np.testing.assert_allclose(got[:, :3], rgb, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(got[:, 3], 1.0)
