"""Conductor (smooth + rough GGX) material (include/cmat_conductor.h).

Spectral eta/k ride as a [4]-lane per ray; in RGB mode all four lanes carry
the same scalar values.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lmath import dot, normalize, reflect, coordinate_system_v2
from . import common as C
from ..scene import build as B


def _fr_complex4(cos_theta, eta_spec, k_spec):
    """FrComplexConductor per wavelength lane: cos [N], eta/k [N,4] -> [N,4]."""
    eta_c = eta_spec + 1j * k_spec
    return C.fr_complex_conductor(cos_theta[..., None], eta_c).real.astype(jnp.float32)


def sample_and_eval(md, eta_spec, k_spec, rands, v, n, alpha_tex):
    """conductorSmooth/RoughSampleAndEval dispatch on trEffectivelySmooth."""
    rgb_refl = md['colors'][..., B.CONDUCTOR_COLOR, :]
    alpha = jnp.stack([
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_U], alpha_tex[..., 0]),
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_V], alpha_tex[..., 1])], -1)
    alpha_raw = jnp.stack([md['data'][..., B.CONDUCTOR_ROUGH_V],
                           md['data'][..., B.CONDUCTOR_ROUGH_U]], -1)
    smooth = C.tr_effectively_smooth(alpha_raw)

    # ---- smooth: perfect mirror (cmat_conductor.h:7-28)
    perf_dir = reflect(-v, n)
    cos_out = dot(perf_dir, n)
    fr = _fr_complex4(cos_out, eta_spec, k_spec)
    smooth_val = jnp.where((cos_out <= 1e-6)[..., None], 0.0,
                           fr / jnp.maximum(cos_out, 1e-6)[..., None])
    smooth_val = smooth_val * rgb_refl

    # ---- rough (cmat_conductor.h:61-103); note alpha = (min(ROUGH_U, tex.x),
    # min(ROUGH_V, tex.y))
    alpha_r = jnp.stack([
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_U], alpha_tex[..., 0]),
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_V], alpha_tex[..., 1])], -1)
    nx, ny = coordinate_system_v2(n)
    nz = n
    wo = jnp.stack([dot(v, nx), dot(v, ny), dot(v, nz)], -1)
    wm = C.tr_sample(wo, rands[..., :2], alpha_r)
    wi = reflect(-wo, wm)
    same_hemi = wo[..., 2] * wi[..., 2] >= 0
    cos_o = C._abs_cos_theta(wo)
    cos_i = C._abs_cos_theta(wi)
    fr_m = _fr_complex4(jnp.abs(dot(wo, wm)), eta_spec, k_spec)
    d = C.tr_d(wm, alpha_r)
    g = C.tr_g(wo, wi, alpha_r)
    denom = jnp.maximum(4.0 * cos_i * cos_o, 1e-20)
    rough_val4 = fr_m * (d * g / denom)[..., None]
    bad = ~same_hemi | (cos_i == 0) | (cos_o == 0) | (wo[..., 2] == 0)
    rough_val4 = jnp.where(bad[..., None], 0.0, rough_val4) * rgb_refl
    rough_dir = normalize(wi[..., 0:1] * nx + wi[..., 1:2] * ny + wi[..., 2:3] * nz)
    rough_pdf = C.tr_pdf(wo, wm, alpha_r) / jnp.maximum(4.0 * jnp.abs(dot(wo, wm)), 1e-20)
    # dead sample when not in same hemisphere: zero val, keep pdf=1 like ref init
    rough_pdf = jnp.where(bad, 1.0, rough_pdf)
    rough_dir = jnp.where(bad[..., None],
                          jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), rough_dir.shape),
                          rough_dir)

    val = jnp.where(smooth[..., None], smooth_val, rough_val4)
    out_dir = jnp.where(smooth[..., None], perf_dir, rough_dir)
    pdf = jnp.where(smooth, 1.0, rough_pdf)
    flags = jnp.where(smooth, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC))
    return dict(val=val, dir=out_dir, pdf=pdf, flags=flags,
                ior=jnp.ones_like(pdf))


def eval(md, eta_spec, k_spec, l, v, n, alpha_tex):
    """conductorRoughEval (cmat_conductor.h:105-137); smooth evals to zero."""
    rgb_refl = md['colors'][..., B.CONDUCTOR_COLOR, :]
    alpha_raw = jnp.stack([md['data'][..., B.CONDUCTOR_ROUGH_V],
                           md['data'][..., B.CONDUCTOR_ROUGH_U]], -1)
    smooth = C.tr_effectively_smooth(alpha_raw)
    alpha_r = jnp.stack([
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_U], alpha_tex[..., 0]),
        jnp.minimum(md['data'][..., B.CONDUCTOR_ROUGH_V], alpha_tex[..., 1])], -1)
    nx, ny = coordinate_system_v2(n)
    nz = n
    wo = jnp.stack([dot(v, nx), dot(v, ny), dot(v, nz)], -1)
    wi = jnp.stack([dot(l, nx), dot(l, ny), dot(l, nz)], -1)
    same = wo[..., 2] * wi[..., 2] >= 0.0
    wm = wo + wi
    wm_ok = jnp.sum(wm * wm, -1) > 0
    wm = normalize(wm)
    cos_o = C._abs_cos_theta(wo)
    cos_i = C._abs_cos_theta(wi)
    fr_m = _fr_complex4(jnp.abs(dot(wo, wm)), eta_spec, k_spec)
    d = C.tr_d(wm, alpha_r)
    g = C.tr_g(wo, wi, alpha_r)
    val4 = fr_m * (d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-20))[..., None]
    wm_ff = jnp.where((wm[..., 2] < 0)[..., None], -wm, wm)
    pdf = C.tr_pdf(wo, wm_ff, alpha_r) / jnp.maximum(4.0 * jnp.abs(dot(wo, wm_ff)), 1e-20)
    bad = smooth | ~same | ~wm_ok | (cos_i == 0) | (cos_o == 0)
    return dict(val=jnp.where(bad[..., None], 0.0, val4 * rgb_refl),
                pdf=jnp.where(bad, 0.0, pdf))
