"""Plastic (Mitsuba-style) material load + rough-transmittance precompute.

Reference: LoadPlasticMaterial (integrator_pt_scene_mat.cpp:~680-780) and the
``mi::fresnel_coat_precompute`` pipeline (mi_materials.cpp:100-469) producing
a 64-entry rough-transmittance LUT stored in ``m_arrays1f``.
"""
from __future__ import annotations

import numpy as np

MI_ROUGH_TRANSMITTANCE_RES = 64


def _gauss_legendre(n: int):
    """Gauss-Legendre nodes/weights on [-1, 1] (mi_materials.cpp gauss_legendre)."""
    return np.polynomial.legendre.leggauss(n)


def fresnel_dielectric(cos_theta_i, eta):
    cos_theta_i = np.clip(cos_theta_i, -1.0, 1.0)
    eta_e = np.where(cos_theta_i < 0.0, 1.0 / eta, eta)
    ci = np.abs(cos_theta_i)
    sin2_t = (1.0 - ci * ci) / (eta_e * eta_e)
    tir = sin2_t >= 1.0
    ct = np.sqrt(np.maximum(1.0 - sin2_t, 0.0))
    r_parl = (eta_e * ci - ct) / (eta_e * ci + ct)
    r_perp = (ci - eta_e * ct) / (ci + eta_e * ct)
    r = 0.5 * (r_parl ** 2 + r_perp ** 2)
    return np.where(tir, 1.0, r)


def rough_transmittance_lut(eta: float, alpha: float, res: int = MI_ROUGH_TRANSMITTANCE_RES,
                            n_quad: int = 32) -> np.ndarray:
    """Directional transmittance through a rough dielectric interface.

    T(cos_theta) = 1 - integral of Fresnel-weighted GGX-visible reflectance;
    approximated for smooth case by 1 - Fr(cos_theta, eta), and for rough
    surfaces by quadrature over microfacet normals (matches the intent of
    mi::fresnel_coat_precompute; exact Mitsuba tables differ at the few-percent
    level for very rough coatings — refined alongside golden tests).
    """
    cos_thetas = np.linspace(0.0, 1.0, res, dtype=np.float64)
    cos_thetas[0] = 1e-3
    if alpha < 1e-3:
        t = 1.0 - fresnel_dielectric(cos_thetas, eta)
        return t.astype(np.float32)

    # numeric integration of transmitted energy through GGX microfacets
    nodes, weights = _gauss_legendre(n_quad)
    # microfacet slope integration over theta_m in [0, pi/2)
    theta_m = 0.25 * np.pi * (nodes + 1.0)
    w_m = 0.25 * np.pi * weights
    out = np.zeros(res)
    a2 = alpha * alpha
    for i, ct in enumerate(cos_thetas):
        st = np.sqrt(max(0.0, 1.0 - ct * ct))
        # average over azimuth phi of the half-vector
        phi = np.linspace(0.0, np.pi, 16, endpoint=False)
        ctm = np.cos(theta_m)[:, None]
        stm = np.sin(theta_m)[:, None]
        # D(theta_m) * cos(theta_m) * sin(theta_m) is the microfacet density
        d = a2 / (np.pi * (ctm * ctm * (a2 - 1.0) + 1.0) ** 2)
        cos_i = np.clip(ct * ctm + st * stm * np.cos(phi)[None, :], 0.0, 1.0)
        fr = fresnel_dielectric(cos_i, eta)
        num = np.sum(w_m[:, None] * d * ctm * stm * (1.0 - fr) * cos_i)
        den = np.sum(w_m[:, None] * d * ctm * stm * cos_i * np.ones_like(phi)[None, :])
        out[i] = num / max(den, 1e-12)
    return out.astype(np.float32)


def load_plastic_material(node, tc, spectral_mode, arrays1f_list, arrays1f_len):
    """Returns (MaterialRec, new_arrays1f_len); appends the LUT to arrays1f."""
    from . import build as B
    from . import hydra_xml

    mat = B.MaterialRec()
    mat.mtype = B.MAT_TYPE_PLASTIC
    cnode = node.find('reflectance')
    if cnode is None:
        cnode = node.find('color')
    if cnode is not None:
        mat.colors[B.PLASTIC_COLOR] = hydra_xml.read_color(cnode)
        slot, r0, r1 = tc.slot_from_node(cnode)
        mat.texid[0], mat.row0[0], mat.row1[0] = slot, r0, r1
        s = cnode.find('spectrum')
        mat.spdid[0] = int(s.get('id')) if s is not None else B.INVALID_ID

    int_ior = B._read1f(node.find('int_ior'), 1.49)
    ext_ior = B._read1f(node.find('ext_ior'), 1.000277)
    alpha = B._read1f(node.find('alpha'), 0.1)
    nonlinear = node.find('nonlinear')
    mat.nonlinear = 1 if (nonlinear is not None and B._read1f(nonlinear) != 0) else 0

    eta = int_ior / ext_ior
    mat.data[B.PLASTIC_IOR_RATIO] = eta
    mat.data[B.PLASTIC_ROUGHNESS] = alpha

    # spec-sample weight from mean reflectances (mitsuba plastic)
    refl = mat.colors[B.PLASTIC_COLOR]
    d_mean = float(np.mean(refl[:3]))
    s_mean = 1.0
    mat.data[B.PLASTIC_SPEC_SAMPLE_WEIGHT] = s_mean / (d_mean + s_mean)

    lut = rough_transmittance_lut(eta, alpha)
    mat.datai[0] = arrays1f_len
    arrays1f_list.append(lut)
    arrays1f_len += lut.size
    # internal diffuse reflectance precompute values
    mat.data[B.PLASTIC_PRECOMP_REFLECTANCE] = float(lut[-1])
    mat.data[B.GLTF_FLOAT_MI_FDR_INT] = B._fdr(1.0 / eta)
    mat.data[B.GLTF_FLOAT_MI_FDR_EXT] = B._fdr(eta)
    return mat, arrays1f_len
