"""Thin-film material load + R/T table precompute (numpy, scene-build time).

The analog of LoadThinFilmMaterial + precomputeThinFilmSpectral/RGB
(integrator_pt_scene_mat.cpp:791-1193).  Tables are computed fully
vectorized over the (wavelength x angle) grid with numpy complex128 —
the reference's nested scalar loops become one broadcasted evaluation.

Table layouts (flattened into ``Scene.precomp_films``):
* spectral: [4, FILM_LENGTH_RES, FILM_ANGLE_RES] sections
  (ext_refl, ext_refr, int_refl, int_refr)
* RGB:      [4, T, FILM_ANGLE_RES, 3] with T = FILM_THICKNESS_RES when the
  material has a thickness map, else 1.  RGB values come from integrating
  the spectral tables against CIE 1931 and converting XYZ->sRGB (the
  reference routes this through libspectral's spectre2xyz; we integrate
  the same 94-sample spectrum against the same CIE tables directly).
"""
from __future__ import annotations

import numpy as np

from ..bsdf import film as F
from ..bsdf.film import (FILM_ANGLE_RES, FILM_LENGTH_RES, FILM_THICKNESS_RES,
                         LAMBDA_MIN, LAMBDA_MAX)
from ..ops import spectrum as SPEC
from . import hydra_xml

INVALID_ID = 0xFFFFFFFF


def _sample_spd_np(spec_values, spec_offset_sz, spec_id, lam):
    """SampleUniformSpectrum on the 1nm grid, numpy (spectrum.h:106-126)."""
    offset = int(spec_offset_sz[spec_id, 0])
    wavesn = int(LAMBDA_MAX - LAMBDA_MIN)
    idx1 = np.clip(lam - LAMBDA_MIN, 0, wavesn - 1).astype(np.int64)
    idx2 = np.minimum(idx1 + 1, wavesn - 1)
    x1 = LAMBDA_MIN + idx1
    y1 = spec_values[offset + idx1]
    y2 = spec_values[offset + idx2]
    return y1 + (lam - x1) * (y2 - y1)


def _resolve_iors(ext_ior, etas, ks, eta_ids, k_ids, spec_values,
                  spec_offset_sz, lams):
    """IOR per (layer+1, wavelength): external medium first."""
    layers = len(etas)
    iors = [np.full(lams.shape, ext_ior, np.complex128)]
    for li in range(layers):
        eta = np.full(lams.shape, etas[li], np.float64)
        if eta_ids[li] != INVALID_ID and spec_values is not None:
            eta = _sample_spd_np(spec_values, spec_offset_sz, eta_ids[li], lams)
        k = np.full(lams.shape, ks[li], np.float64)
        if k_ids[li] != INVALID_ID and spec_values is not None:
            k = _sample_spd_np(spec_values, spec_offset_sz, k_ids[li], lams)
        iors.append(eta + 1j * k)
    return iors


def _rt_grid(iors, thicknesses, lams, cos_thetas):
    """(refl, refr) over the [len(lams), len(cos_thetas)] grid."""
    layers = len(iors) - 1
    lam_g = lams[:, None]
    cos_g = cos_thetas[None, :]
    iors_g = [i[:, None] for i in iors]
    if layers == 2:
        fwd = F.fr_film(cos_g, iors_g[0], iors_g[1], iors_g[2],
                        thicknesses[0], lam_g, xp=np)
        bwd = F.fr_film(cos_g, iors_g[2], iors_g[1], iors_g[0],
                        thicknesses[0], lam_g, xp=np)
    else:
        # recursive Airy is the reference's ACTIVE multilayer route
        # (multFrFilm, integrator_pt_scene_mat.cpp:853-856 — the transfer-
        # matrix calls there are commented out); transfer_matrix_fr is
        # implemented and cross-checked to 1e-4 in tests/test_film.py
        fwd = F.mult_fr_film(cos_g, iors_g, list(thicknesses), lam_g, xp=np)
        bwd = F.mult_fr_film(cos_g, iors_g, list(thicknesses), lam_g, xp=np,
                             reverse=True)
    return fwd, bwd


def precompute_film_spectral(ext_ior, etas, ks, eta_ids, k_ids, thicknesses,
                             spec_values, spec_offset_sz) -> np.ndarray:
    """precomputeThinFilmSpectral (integrator_pt_scene_mat.cpp:791-890).

    Returns flat [4 * L * A] float32.
    """
    lams = ((LAMBDA_MAX - LAMBDA_MIN - 1) / (FILM_LENGTH_RES - 1)
            * np.arange(FILM_LENGTH_RES) + LAMBDA_MIN)
    thetas = np.pi / 2 / (FILM_ANGLE_RES - 1) * np.arange(FILM_ANGLE_RES)
    cos_thetas = np.clip(np.cos(thetas), 1e-3, 1.0)
    iors = _resolve_iors(ext_ior, etas, ks, eta_ids, k_ids, spec_values,
                         spec_offset_sz, lams)
    (er, et), (ir_, it) = _rt_grid(iors, thicknesses, lams, cos_thetas)
    return np.concatenate([np.asarray(x, np.float32).reshape(-1)
                           for x in (er, et, ir_, it)])


def _spectra_to_rgb(grid_LA):
    """94-sample spectrum -> linear sRGB per angle (spectre2xyz + xyz2rgb).

    grid_LA: [L, A] reflectance sampled at the precompute wavelengths.
    """
    lams = ((LAMBDA_MAX - LAMBDA_MIN) / (FILM_LENGTH_RES - 1)
            * np.arange(FILM_LENGTH_RES) + LAMBDA_MIN)
    cie = SPEC.cie_xyz_table()  # [471, 4] at 1nm from 360
    idx = np.clip(np.round(lams - LAMBDA_MIN).astype(np.int64), 0,
                  cie.shape[0] - 1)
    w = cie[idx, :3]  # [L, 3]
    y_int = w[:, 1].sum()
    xyz = grid_LA.T @ w / max(y_int, 1e-9)  # [A, 3]
    m = np.array([[3.240479, -1.537150, -0.498535],
                  [-0.969256, 1.875991, 0.041556],
                  [0.055648, -0.204043, 1.057311]], np.float64)
    rgb = xyz @ m.T
    return np.clip(rgb, 0.0, None)


def precompute_film_rgb(ext_ior, etas, ks, eta_ids, k_ids, thicknesses,
                        spec_values, spec_offset_sz, thickness_res=1,
                        t_min=0.0, t_max=1000.0) -> np.ndarray:
    """precomputeThinFilmRGB (integrator_pt_scene_mat.cpp:892-1018).

    Returns flat [4 * T * A * 3] float32.
    """
    lams = ((LAMBDA_MAX - LAMBDA_MIN) / (FILM_LENGTH_RES - 1)
            * np.arange(FILM_LENGTH_RES) + LAMBDA_MIN)
    thetas = np.pi / 2 / (FILM_ANGLE_RES - 1) * np.arange(FILM_ANGLE_RES)
    cos_thetas = np.clip(np.cos(thetas), 1e-3, 1.0)
    iors = _resolve_iors(ext_ior, etas, ks, eta_ids, k_ids, spec_values,
                         spec_offset_sz, lams)
    layers = len(iors) - 1

    secs = [[], [], [], []]
    for t in range(thickness_res):
        if thickness_res == 1:
            th0 = thicknesses[0] if len(thicknesses) else 0.0
        else:
            th0 = (t_max - t_min) / (thickness_res - 1) * t + t_min
        # the thickness grid only drives single-film-layer stacks; deeper
        # stacks keep their fixed per-layer thicknesses (reference:963)
        ths = [th0] if layers <= 2 else list(thicknesses)
        (er, et), (ir_, it) = _rt_grid(iors, ths, lams, cos_thetas)
        for si, grid in enumerate((er, et, ir_, it)):
            secs[si].append(_spectra_to_rgb(np.asarray(grid)))  # [A,3]
    out = [np.stack(s, 0).astype(np.float32).reshape(-1) for s in secs]
    return np.concatenate(out)


class FilmState:
    """Accumulates per-scene film arrays across materials
    (m_films_thickness_vec / m_films_eta_k_vec / m_films_spec_id_vec /
    m_precomp_thin_films, integrator_pt.h:585-591)."""

    def __init__(self):
        self.thickness: list[float] = []
        self.eta_k: list[float] = []
        self.spec_id: list[int] = []
        self.precomp: list[np.ndarray] = []
        self.precomp_len = 0

    def arrays(self):
        th = np.asarray(self.thickness or [0.0], np.float32)
        ek = np.asarray(self.eta_k or [1.0], np.float32)
        si = np.asarray(self.spec_id or [INVALID_ID],
                        np.int64).astype(np.uint32).astype(np.int32)
        pc = (np.concatenate(self.precomp) if self.precomp
              else np.zeros(1, np.float32))
        return th, ek, si, pc


def _spec_id_from(node):
    if node is None:
        return INVALID_ID
    s = node.find('spectrum')
    return int(s.get('id')) if s is not None else INVALID_ID


def load_thin_film_material(node, tc, spectral_mode, state: FilmState,
                            spec_values, spec_offset_sz):
    """LoadThinFilmMaterial (integrator_pt_scene_mat.cpp:1020-1193)."""
    from . import build as B

    mat = B.MaterialRec()
    mat.mtype = B.MAT_TYPE_THIN_FILM
    mat.colors[0] = (1, 1, 1, 0)

    d = mat.data
    alpha_u = alpha_v = 0.0
    anode = node.find('alpha')
    if anode is not None:
        alpha_u = alpha_v = hydra_xml._read_val_f(anode, 0.0)
        slot, r0, r1 = tc.slot_from_node(anode)
        if slot != 0:
            alpha_u = alpha_v = 1.0
        mat.texid[0], mat.row0[0], mat.row1[0] = slot, r0, r1
    else:
        alpha_u = hydra_xml._read_val_f(node.find('alpha_u'), 0.0)
        alpha_v = hydra_xml._read_val_f(node.find('alpha_v'), 0.0)
    d[F.FILM_ROUGH_U] = alpha_u
    d[F.FILM_ROUGH_V] = alpha_v

    tmap = node.find('thickness_map')
    if tmap is not None:
        d[F.FILM_THICKNESS_MIN] = float(tmap.get('min', '0'))
        d[F.FILM_THICKNESS_MAX] = float(tmap.get('max', '1000'))
        d[F.FILM_THICKNESS_MAP] = 1.0
        slot, r0, r1 = tc.slot_from_node(tmap)
        mat.texid[2], mat.row0[2], mat.row1[2] = slot, r0, r1

    d[F.FILM_ETA_EXT] = hydra_xml._read_val_f(node.find('ext_ior'), 1.00028)

    d[F.FILM_THICKNESS_OFFSET] = float(len(state.thickness))
    d[F.FILM_ETA_SPECID_OFFSET] = float(len(state.spec_id))
    d[F.FILM_ETA_OFFSET] = float(len(state.eta_k))

    layers_node = node.find('layers')
    layer_nodes = list(layers_node) if layers_node is not None else []
    thicknesses = []
    etas, ks, eta_ids, k_ids = [], [], [], []
    for ln in layer_nodes:
        tn = ln.find('thickness')
        if tn is not None:
            thicknesses.append(hydra_xml._read_val_f(tn, 0.0))
        etas.append(hydra_xml._read_val_f(ln.find('eta'), 1.0))
        eta_ids.append(_spec_id_from(ln.find('eta')))
    if node.find('eta') is not None:
        etas.append(hydra_xml._read_val_f(node.find('eta'), 1.0))
        eta_ids.append(_spec_id_from(node.find('eta')))
    layers = len(etas)

    for ln in layer_nodes:
        ks.append(hydra_xml._read_val_f(ln.find('k'), 0.0))
        k_ids.append(_spec_id_from(ln.find('k')))
    if node.find('k') is not None:
        ks.append(hydra_xml._read_val_f(node.find('k'), 0.0))
        k_ids.append(_spec_id_from(node.find('k')))
    while len(ks) < layers:
        ks.append(0.0)
        k_ids.append(INVALID_ID)

    state.thickness.extend(thicknesses)
    state.eta_k.extend(etas)
    state.eta_k.extend(ks)
    state.spec_id.extend(eta_ids)
    state.spec_id.extend(k_ids)
    d[F.FILM_K_SPECID_OFFSET] = d[F.FILM_ETA_SPECID_OFFSET] + layers
    d[F.FILM_K_OFFSET] = d[F.FILM_ETA_OFFSET] + layers
    d[F.FILM_THICKNESS] = thicknesses[0] if thicknesses else 0.0
    d[F.FILM_LAYERS_COUNT] = float(layers)

    transparent = node.find('transparent')
    d[F.FILM_TRANSPARENT] = float(int(hydra_xml._read_val_f(transparent, 0.0))
                                  if transparent is not None else 0)

    # precompute unless (spectral AND thickness-mapped AND single film layer)
    precomp = (not spectral_mode) or (tmap is None) or (layers > 2)
    d[F.FILM_PRECOMP_FLAG] = 1.0 if precomp else 0.0
    d[F.FILM_PRECOMP_OFFSET] = float(state.precomp_len)
    if precomp:
        if spectral_mode:
            table = precompute_film_spectral(
                d[F.FILM_ETA_EXT], etas, ks, eta_ids, k_ids, thicknesses,
                spec_values, spec_offset_sz)
        elif tmap is not None and layers <= 2:
            table = precompute_film_rgb(
                d[F.FILM_ETA_EXT], etas, ks, eta_ids, k_ids, thicknesses,
                spec_values, spec_offset_sz, FILM_THICKNESS_RES,
                d[F.FILM_THICKNESS_MIN], d[F.FILM_THICKNESS_MAX])
        else:
            table = precompute_film_rgb(
                d[F.FILM_ETA_EXT], etas, ks, eta_ids, k_ids, thicknesses,
                spec_values, spec_offset_sz)
        state.precomp.append(table)
        state.precomp_len += len(table)
    return mat
