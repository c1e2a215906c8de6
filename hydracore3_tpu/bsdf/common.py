"""Shared BSDF math primitives (batched).

Ports of the pure-math helpers in include/cmaterial.h — Lambert, GGX,
Trowbridge-Reitz (PBRT-v4 style), Mitsuba-style visible-normal sampling and
Fresnel terms — rewritten as array programs over the last axis.  Citations
point at the reference implementations whose behavior is matched.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lmath import (
    M_PI, M_TWOPI, INV_PI, DEPSILON,
    coordinate_system_v2, dot, cross, normalize, safe_sqrt, clamp, lerp,
    map_sample_to_cosine_distribution,
)

# MATERIAL_EVENT (cmaterial.h:48-56)
RAY_EVENT_S = 1
RAY_EVENT_D = 2
RAY_EVENT_G = 4
RAY_EVENT_T = 8
RAY_EVENT_V = 16
RAY_EVENT_TOUT = 32
RAY_EVENT_TNINGLASS = 64

# ray flags (cglobals.h:9-16)
RAY_FLAG_IS_DEAD = 0x80000000
RAY_FLAG_OUT_OF_SCENE = 0x40000000
RAY_FLAG_HIT_LIGHT = 0x20000000
RAY_FLAG_HAS_NON_SPEC = 0x10000000
RAY_FLAG_HAS_INV_NORMAL = 0x08000000
RAY_FLAG_WAVES_DIVERGED = 0x04000000
RAY_FLAG_PRIME_RAY_MISS = 0x02000000
RAY_FLAG_FIRST_NON_SPEC = 0x01000000


# ---------------------------------------------------------------------------
# Lambert (cmaterial.h:215-228)
# ---------------------------------------------------------------------------

def lambert_sample(rands2, v, n):
    return map_sample_to_cosine_distribution(
        rands2[..., 0], rands2[..., 1], n, n, 1.0)


def lambert_eval_pdf(l, v, n):
    return jnp.abs(dot(l, n)) * INV_PI


def lambert_eval_bsdf(l, v, n):
    return jnp.full(l.shape[:-1], INV_PI, l.dtype)


# ---------------------------------------------------------------------------
# Oren-Nayar (cmaterial.h:254-312)
# ---------------------------------------------------------------------------

def orennayar_func(a_l, a_v, a_n, roughness):
    cos_wi = dot(a_l, a_n)
    cos_wo = dot(a_v, a_n)
    sin_wi = safe_sqrt(1.0 - cos_wi * cos_wi)
    sin_wo = safe_sqrt(1.0 - cos_wo * cos_wo)
    sigma = roughness * M_PI * 0.5
    sigma2 = sigma * sigma
    A = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    B = 0.45 * sigma2 / (sigma2 + 0.09)

    nx, ny = coordinate_system_v2(a_n)
    nz = a_n
    wo = jnp.stack([-dot(a_v, nx), -dot(a_v, ny), -dot(a_v, nz)], -1)
    wi = jnp.stack([-dot(a_l, nx), -dot(a_l, ny), -dot(a_l, nz)], -1)

    def sin_phi(w, st):
        return jnp.where(st == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.where(st == 0, 1.0, st), -1, 1))

    def cos_phi(w, st):
        return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(st == 0, 1.0, st), -1, 1))

    dcos = (cos_phi(wi, sin_wi) * cos_phi(wo, sin_wo)
            + sin_phi(wi, sin_wi) * sin_phi(wo, sin_wo))
    maxcos = jnp.where((sin_wi > 1e-4) & (sin_wo > 1e-4),
                       jnp.maximum(0.0, dcos), 0.0)

    wi_bigger = jnp.abs(cos_wi) > jnp.abs(cos_wo)
    sinalpha = jnp.where(wi_bigger, sin_wo, sin_wi)
    tanbeta = jnp.where(wi_bigger,
                        sin_wi / jnp.maximum(jnp.abs(cos_wi), DEPSILON),
                        sin_wo / jnp.maximum(jnp.abs(cos_wo), DEPSILON))
    return A + B * maxcos * sinalpha * tanbeta


# ---------------------------------------------------------------------------
# Hydra GGX (cmaterial.h:322-397)
# ---------------------------------------------------------------------------

def ggx_distribution(cos_theta_nh, alpha):
    alpha2 = alpha * alpha
    nh_sqr = jnp.clip(cos_theta_nh * cos_theta_nh, 0.0, 1.0)
    den = nh_sqr * alpha2 + (1.0 - nh_sqr)
    return alpha2 / jnp.maximum(M_PI * den * den, 1e-6)


def ggx_geom_shad_mask(cos_theta_n, alpha):
    cos2 = jnp.clip(cos_theta_n * cos_theta_n, 0.0, 1.0)
    tan2 = (1.0 - cos2) / jnp.maximum(cos2, 1e-6)
    return 2.0 / (1.0 + safe_sqrt(1.0 + alpha * alpha * tan2))


def spherical_direction_pbrt(sintheta, costheta, phi):
    return jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], -1)


def ggx_sample(rands2, v, n, roughness):
    rough_sqr = roughness * roughness
    nx, ny = coordinate_system_v2(n)
    nz = n
    wo = jnp.stack([dot(v, nx), dot(v, ny), dot(v, nz)], -1)
    phi = rands2[..., 0] * M_TWOPI
    r2 = rands2[..., 1]
    cos_theta = jnp.clip(
        safe_sqrt((1.0 - r2) / (1.0 + rough_sqr * rough_sqr * r2 - r2)), 0.0, 1.0)
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    wh = spherical_direction_pbrt(sin_theta, cos_theta, phi)
    wi = 2.0 * dot(wo, wh)[..., None] * wh - wo
    world = (wi[..., 0:1] * nx + wi[..., 1:2] * ny + wi[..., 2:3] * nz)
    return normalize(world)


def ggx_eval_pdf(l, v, n, roughness):
    dot_nv = dot(n, v)
    dot_nl = dot(n, l)
    rough_sqr = roughness * roughness
    h = normalize(v + l)
    dot_nh = dot(n, h)
    dot_hv = dot(h, v)
    d = ggx_distribution(dot_nh, rough_sqr)
    pdf = d * dot_nh / (4.0 * jnp.maximum(dot_hv, 1e-6))
    return jnp.where((dot_nv < 1e-6) | (dot_nl < 1e-6), 1.0, pdf)


def ggx_eval_bsdf(l, v, n, roughness):
    dot_nv = dot(n, v)
    dot_nl = dot(n, l)
    rough_sqr = roughness * roughness
    h = normalize(v + l)
    dot_nh = dot(n, h)
    d = ggx_distribution(dot_nh, rough_sqr)
    g = ggx_geom_shad_mask(dot_nv, rough_sqr) * ggx_geom_shad_mask(dot_nl, rough_sqr)
    val = d * g / jnp.maximum(4.0 * dot_nv * dot_nl, 1e-6)
    bad = (jnp.abs(dot(l, n)) < 1e-5) | (dot_nv < 1e-6) | (dot_nl < 1e-6)
    return jnp.where(bad, 0.0, val)


# ---------------------------------------------------------------------------
# Trowbridge-Reitz / PBRT-v4 (cmaterial.h:405-530)
# ---------------------------------------------------------------------------

def _cos_theta(w):
    return w[..., 2]


def _cos2_theta(w):
    return w[..., 2] * w[..., 2]


def _abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def _sin2_theta(w):
    return jnp.maximum(0.0, 1.0 - _cos2_theta(w))


def _tan2_theta(w):
    return _sin2_theta(w) / jnp.maximum(_cos2_theta(w), 1e-20)


def _cos_phi(w):
    st = safe_sqrt(_sin2_theta(w))
    return jnp.where(st == 0.0, 1.0, jnp.clip(w[..., 0] / jnp.where(st == 0, 1.0, st), -1, 1))


def _sin_phi(w):
    st = safe_sqrt(_sin2_theta(w))
    return jnp.where(st == 0.0, 0.0, jnp.clip(w[..., 1] / jnp.where(st == 0, 1.0, st), -1, 1))


def tr_d(wm, alpha):
    """trD(wm, alpha2) (cmaterial.h:460-470)."""
    tan2 = _tan2_theta(wm)
    cos4 = _cos2_theta(wm) * _cos2_theta(wm)
    e = tan2 * ((_cos_phi(wm) / alpha[..., 0]) ** 2 + (_sin_phi(wm) / alpha[..., 1]) ** 2)
    val = 1.0 / (M_PI * alpha[..., 0] * alpha[..., 1] * cos4 * (1 + e) * (1 + e))
    return jnp.where((cos4 < 1e-16) | ~jnp.isfinite(tan2), 0.0, val)


def tr_effectively_smooth(alpha):
    return jnp.maximum(alpha[..., 0], alpha[..., 1]) < 1e-3


def tr_lambda(w, alpha):
    tan2 = _tan2_theta(w)
    a2 = (_cos_phi(w) * alpha[..., 0]) ** 2 + (_sin_phi(w) * alpha[..., 1]) ** 2
    val = (safe_sqrt(1.0 + a2 * tan2) - 1.0) / 2.0
    return jnp.where(jnp.isfinite(tan2), val, 0.0)


def tr_g1(w, alpha):
    return 1.0 / (1.0 + tr_lambda(w, alpha))


def tr_g(wo, wi, alpha):
    return 1.0 / (1.0 + tr_lambda(wo, alpha) + tr_lambda(wi, alpha))


def tr_d_visible(w, wm, alpha):
    """trD(w, wm, alpha) visible-normal density (cmaterial.h:496-499)."""
    return (tr_g1(w, alpha) / jnp.maximum(_abs_cos_theta(w), 1e-20)
            * tr_d(wm, alpha) * jnp.abs(dot(w, wm)))


def tr_pdf(w, wm, alpha):
    return tr_d_visible(w, wm, alpha)


def sample_uniform_disk_polar(u):
    r = safe_sqrt(u[..., 0])
    theta = M_TWOPI * u[..., 1]
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], -1)


def tr_sample(wo, rands2, alpha):
    """trSample (cmaterial.h:506-530): VNDF sampling in local frame."""
    wh = normalize(jnp.stack([alpha[..., 0] * wo[..., 0],
                              alpha[..., 1] * wo[..., 1],
                              wo[..., 2]], -1))
    wh = jnp.where((wh[..., 2] < 0)[..., None], -wh, wh)
    up = jnp.zeros_like(wh).at[..., 2].set(1.0)
    t1 = jnp.where((wh[..., 2] < 0.99999)[..., None],
                   normalize(jnp.cross(up, wh)),
                   jnp.zeros_like(wh).at[..., 0].set(1.0))
    t2 = jnp.cross(wh, t1)
    p = sample_uniform_disk_polar(rands2)
    h = safe_sqrt(1.0 - p[..., 0] * p[..., 0])
    py = lerp(h, p[..., 1], (1.0 + wh[..., 2]) / 2.0)
    p = jnp.stack([p[..., 0], py], -1)
    pz = safe_sqrt(1.0 - jnp.sum(p * p, -1))
    nh = (p[..., 0:1] * t1 + p[..., 1:2] * t2 + pz[..., None] * wh)
    return normalize(jnp.stack([alpha[..., 0] * nh[..., 0],
                                alpha[..., 1] * nh[..., 1],
                                jnp.maximum(1e-6, nh[..., 2])], -1))


# ---------------------------------------------------------------------------
# Fresnel (cmaterial.h:536-717)
# ---------------------------------------------------------------------------

def fr_dielectric_pbrt(cos_theta_i, eta_i, eta_t):
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    entering = cos_theta_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    # eta==0 means "Fresnel disabled" in Hydra materials (never evaluated in
    # the reference's guarded branches); keep the math NaN-free for AD.
    et_s = jnp.where(jnp.abs(et) < 1e-12, 1.0, et)
    ei_s = jnp.where(jnp.abs(ei) < 1e-12, 1.0, ei)
    ci = jnp.abs(cos_theta_i)
    sin_i = safe_sqrt(1.0 - ci * ci)
    sin_t = ei_s / et_s * sin_i
    ct = safe_sqrt(1.0 - sin_t * sin_t)
    denom1 = et_s * ci + ei_s * ct
    denom2 = ei_s * ci + et_s * ct
    r_parl = (et_s * ci - ei_s * ct) / jnp.where(jnp.abs(denom1) < 1e-12, 1.0, denom1)
    r_perp = (ei_s * ci - et_s * ct) / jnp.where(jnp.abs(denom2) < 1e-12, 1.0, denom2)
    r = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(sin_t >= 1.0, 1.0, r)


def fr_dielectric(cos_theta_i, eta):
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    eta_e = jnp.where(cos_theta_i < 0.0, 1.0 / eta, eta)
    ci = jnp.abs(cos_theta_i)
    sin2_i = 1.0 - ci * ci
    sin2_t = sin2_i / (eta_e * eta_e)
    ct = safe_sqrt(1.0 - sin2_t)
    r_parl = (eta_e * ci - ct) / (eta_e * ci + ct)
    r_perp = (ci - eta_e * ct) / (ci + eta_e * ct)
    r = (r_parl * r_parl + r_perp * r_perp) / 2.0
    return jnp.where(sin2_t >= 1.0, 1.0, r)


def fr_dielectric_detailed_v2(cos_theta_i, eta):
    """FrDielectricDetailedV2 (cmaterial.h:646-683).

    Returns (r, cos_theta_t, eta_it, eta_ti).
    """
    cos_theta_i = jnp.clip(cos_theta_i, -1.0, 1.0)
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)

    cos_t_sqr = 1.0 - (1.0 - cos_theta_i * cos_theta_i) * eta_ti * eta_ti
    ci_abs = jnp.abs(cos_theta_i)
    ct_abs = safe_sqrt(cos_t_sqr)

    a_s = (-eta_it * ct_abs + ci_abs) / jnp.maximum(eta_it * ct_abs + ci_abs, 1e-12)
    a_p = (-eta_it * ci_abs + ct_abs) / jnp.maximum(eta_it * ci_abs + ct_abs, 1e-12)
    r = 0.5 * (a_s * a_s + a_p * a_p)
    special = (eta == 1.0) | (ci_abs == 0.0)
    r = jnp.where(special, jnp.where(eta == 1.0, 0.0, 1.0), r)
    cos_theta_t = jnp.where(cos_theta_i >= 0, -ct_abs, ct_abs)
    return r, cos_theta_t, eta_it, eta_ti


def fr_complex_conductor(cos_theta_i, eta_c):
    """FrComplexConductor (cmaterial.h:685-694) with complex64 eta."""
    sin2 = 1.0 - cos_theta_i * cos_theta_i
    sin2_t = sin2 / (eta_c * eta_c)
    cos_t = jnp.sqrt((1.0 + 0j) - sin2_t)
    r_parl = (eta_c * cos_theta_i - cos_t) / (eta_c * cos_theta_i + cos_t)
    r_perp = (cos_theta_i - eta_c * cos_t) / (cos_theta_i + eta_c * cos_t)
    return (jnp.abs(r_parl) ** 2 + jnp.abs(r_perp) ** 2) / 2.0


def fresnel_slick(v_dot_h):
    tmp = 1.0 - jnp.abs(v_dot_h)
    return (tmp * tmp) * (tmp * tmp) * tmp


def hydra_fresnel_cond(f0, v_dot_h, ior, roughness):
    """cmaterial.h:711-717."""
    fr = f0 + (1.0 - f0) * fresnel_slick(v_dot_h)[..., None]
    return jnp.where((ior == 0.0)[..., None], f0, fr)


# ---------------------------------------------------------------------------
# Mitsuba-style microfacet helpers (cmaterial.h:749-920)
# ---------------------------------------------------------------------------

def square_to_uniform_disk_concentric(s):
    x = 2.0 * s[..., 0] - 1.0
    y = 2.0 * s[..., 1] - 1.0
    zero = (x == 0) & (y == 0)
    case_x = x * x > y * y
    sx = jnp.where(x == 0, 1.0, x)
    sy = jnp.where(y == 0, 1.0, y)
    r = jnp.where(case_x, x, y)
    phi = jnp.where(case_x, (M_PI / 4.0) * (y / sx),
                    (M_PI / 2.0) - (x / sy) * (M_PI / 4.0))
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], -1)


def square_to_cosine_hemisphere(s):
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - jnp.sum(p * p, -1))
    return jnp.concatenate([p, z[..., None]], -1)


def smith_g1(v, m, alpha):
    """cmaterial.h:813-833."""
    xy_a2 = (alpha[..., 0] * v[..., 0]) ** 2 + (alpha[..., 1] * v[..., 1]) ** 2
    tan2 = xy_a2 / jnp.maximum(v[..., 2] * v[..., 2], 1e-20)
    res = 2.0 / (1.0 + safe_sqrt(1.0 + tan2))
    res = jnp.where(xy_a2 == 0.0, 1.0, res)
    res = jnp.where(v[..., 2] * dot(v, m) <= 0.0, 0.0, res)
    return res


def eval_microfacet_ggx(m, alpha):
    """eval_microfacet type=1 (cmaterial.h:840-857)."""
    alpha_uv = alpha[..., 0] * alpha[..., 1]
    e = ((m[..., 0] / alpha[..., 0]) ** 2 + (m[..., 1] / alpha[..., 1]) ** 2
         + m[..., 2] ** 2)
    res = 1.0 / jnp.maximum(M_PI * alpha_uv * e * e, 1e-30)
    return jnp.where(res * m[..., 2] > 1e-20, res, 0.0)


def sample_visible_11(cos_theta_i, samp):
    p = square_to_uniform_disk_concentric(samp)
    s = 0.5 * (1.0 + cos_theta_i)
    py = lerp(safe_sqrt(1.0 - p[..., 0] * p[..., 0]), p[..., 1], s)
    x = p[..., 0]
    y = py
    z = safe_sqrt(1.0 - (x * x + y * y))
    sin_i = safe_sqrt(1.0 - cos_theta_i * cos_theta_i)
    norm = 1.0 / jnp.maximum(sin_i * y + cos_theta_i * z, 1e-20)
    return jnp.stack([(cos_theta_i * y - sin_i * z) * norm, x * norm], -1)


def _sincos_phi(v):
    sin_t2 = v[..., 0] ** 2 + v[..., 1] ** 2
    inv = 1.0 / jnp.maximum(safe_sqrt(sin_t2), 1e-20)
    sx = jnp.clip(v[..., 0] * inv, -1.0, 1.0)
    sy = jnp.clip(v[..., 1] * inv, -1.0, 1.0)
    small = jnp.abs(sin_t2) <= 4.0 * 1.1920929e-7
    cos_phi = jnp.where(small, 1.0, sx)
    sin_phi = jnp.where(small, 0.0, sy)
    return sin_phi, cos_phi


def sample_visible_normal(wi, rands2, alpha):
    """cmaterial.h:876-900. Returns (m [...,3], pdf)."""
    wi_p = normalize(jnp.stack([alpha[..., 0] * wi[..., 0],
                                alpha[..., 1] * wi[..., 1],
                                wi[..., 2]], -1))
    sin_phi, cos_phi = _sincos_phi(wi_p)
    cos_theta = wi_p[..., 2]
    slope = sample_visible_11(cos_theta, rands2)
    slope = jnp.stack([
        (cos_phi * slope[..., 0] - sin_phi * slope[..., 1]) * alpha[..., 0],
        (sin_phi * slope[..., 0] + cos_phi * slope[..., 1]) * alpha[..., 1]], -1)
    m = normalize(jnp.stack([-slope[..., 0], -slope[..., 1],
                             jnp.ones_like(slope[..., 0])], -1))
    pdf = (eval_microfacet_ggx(m, alpha) * smith_g1(wi, m, alpha)
           * jnp.abs(dot(wi, m)) / jnp.maximum(wi[..., 2], 1e-20))
    return m, pdf


def microfacet_g(wi, wo, m, alpha):
    return smith_g1(wi, m, alpha) * smith_g1(wo, m, alpha)


def microfacet_pdf(wi, m, alpha):
    return (eval_microfacet_ggx(m, alpha) * smith_g1(wi, m, alpha)
            * jnp.abs(dot(wi, m)) / jnp.maximum(wi[..., 2], 1e-20))


def refract_local(wi, cos_theta_t, eta_ti):
    """cmaterial.h:917-920 (local frame refraction)."""
    return jnp.stack([-eta_ti * wi[..., 0], -eta_ti * wi[..., 1],
                      jnp.broadcast_to(cos_theta_t, wi[..., 0].shape)], -1)
