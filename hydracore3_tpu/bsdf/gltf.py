"""GLTF metal-rough material (include/cmat_gltf.h), batched.

The reference's sampler picks metal vs dielectric via rands.z, then specular
vs diffuse via rands.w (cmat_gltf.h:45-90); here every lobe is computed for
the full batch and merged with selects — the same estimator, SIMD-friendly.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lmath import dot, normalize, clamp, lerp, reflect
from . import common as C
from ..scene import build as B


def sample_and_eval(md, rands, v, n, base_color, four_params):
    """gltfSampleAndEval (cmat_gltf.h:6-91).

    md: gathered material dict; rands: [N,4]; v,n: [N,3]; base_color [N,4].
    Returns dict(val [N,4], dir [N,3], pdf [N], flags [N] uint32).
    """
    cflags = md['cflags']
    metal_col = md['colors'][..., B.GLTF_COLOR_METAL, :] * base_color
    coat_col = md['colors'][..., B.GLTF_COLOR_COAT, :]
    roughness = clamp(1.0 - md['data'][..., B.GLTF_FLOAT_GLOSINESS] * four_params[..., 0], 0.0, 1.0)
    metalness = md['data'][..., B.GLTF_FLOAT_ALPHA] * four_params[..., 1]
    coat_value = md['data'][..., B.GLTF_FLOAT_REFL_COAT] * four_params[..., 2]
    fresnel_ior = md['data'][..., B.GLTF_FLOAT_IOR]
    metalness = jnp.where(cflags == B.GLTF_COMPONENT_METAL, 1.0, metalness)

    smooth = roughness == 0.0
    # mirror branch
    perf_refl = reflect(-v, n)
    cos_out = dot(perf_refl, n)
    mirror_val = jnp.where(cos_out <= 1e-6, 0.0, 1.0 / jnp.maximum(cos_out, 1e-6))
    # ggx branch
    ggx_dir_r = C.ggx_sample(rands[..., :2], v, n, roughness)
    ggx_dir = jnp.where(smooth[..., None], perf_refl, ggx_dir_r)
    ggx_pdf = jnp.where(smooth, 1.0, C.ggx_eval_pdf(ggx_dir_r, v, n, roughness))
    ggx_val = jnp.where(smooth, mirror_val, C.ggx_eval_bsdf(ggx_dir_r, v, n, roughness))

    lam_dir = C.lambert_sample(rands[..., :2], v, n)
    lam_pdf = C.lambert_eval_pdf(lam_dir, v, n)
    lam_val = C.lambert_eval_bsdf(lam_dir, v, n)

    pick_metal = rands[..., 2] < metalness
    v_dot_h = dot(v, normalize(v + ggx_dir))

    # metal lobe
    metal_bsdf = ggx_val[..., None] * metalness[..., None] * C.hydra_fresnel_cond(
        metal_col, v_dot_h, fresnel_ior, roughness)
    spec_flags = jnp.where(smooth, jnp.uint32(C.RAY_EVENT_S),
                           jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC))

    # dielectric: specular vs diffuse
    f_i = C.fr_dielectric_pbrt(jnp.abs(dot(v, n)), 1.0, fresnel_ior)
    prob_spec = 0.5 * coat_value
    prob_diff = 1.0 - prob_spec
    pick_spec = rands[..., 3] < prob_spec

    coat_bsdf = (ggx_val * (1.0 - metalness) * f_i * coat_value)[..., None] * coat_col

    lam_bsdf = (lam_val * (1.0 - metalness))[..., None] * base_color
    # plastic retroreflection correction (cmat_gltf.h:82-88)
    m_fdr_int = md['data'][..., B.GLTF_FLOAT_MI_FDR_INT]
    f_o = C.fr_dielectric_pbrt(jnp.abs(dot(lam_dir, n)), 1.0, fresnel_ior)
    coeff = lerp(1.0, (1.0 - f_i) * (1.0 - f_o)
                 / jnp.maximum(fresnel_ior * fresnel_ior * (1.0 - m_fdr_int), 1e-12),
                 coat_value)
    apply_coat = (coat_value > 0.0) & (fresnel_ior > 0.0)
    lam_bsdf = jnp.where(apply_coat[..., None], lam_bsdf * coeff[..., None], lam_bsdf)

    # merge
    out_dir = jnp.where(pick_metal[..., None], ggx_dir,
              jnp.where(pick_spec[..., None], ggx_dir, lam_dir))
    out_val = jnp.where(pick_metal[..., None], metal_bsdf,
              jnp.where(pick_spec[..., None], coat_bsdf, lam_bsdf))
    out_pdf = jnp.where(pick_metal, ggx_pdf,
              jnp.where(pick_spec, ggx_pdf, lam_pdf))
    out_flags = jnp.where(pick_metal, spec_flags,
                jnp.where(pick_spec, spec_flags,
                          jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC)))
    pdf_select = jnp.where(pick_metal, metalness,
                 (1.0 - metalness) * jnp.where(pick_spec, prob_spec, prob_diff))
    return dict(val=out_val, dir=out_dir, pdf=out_pdf * pdf_select,
                flags=out_flags, ior=jnp.ones_like(out_pdf))


def eval(md, l, v, n, base_color, four_params):
    """gltfEval (cmat_gltf.h:94-147). Returns dict(val [N,4], pdf [N])."""
    cflags = md['cflags']
    metal_col = md['colors'][..., B.GLTF_COLOR_METAL, :] * base_color
    coat_col = md['colors'][..., B.GLTF_COLOR_COAT, :]
    roughness = clamp(1.0 - md['data'][..., B.GLTF_FLOAT_GLOSINESS] * four_params[..., 0], 0.0, 1.0)
    metalness = md['data'][..., B.GLTF_FLOAT_ALPHA] * four_params[..., 1]
    coat_value = md['data'][..., B.GLTF_FLOAT_REFL_COAT] * four_params[..., 2]
    fresnel_ior = md['data'][..., B.GLTF_FLOAT_IOR]
    metalness = jnp.where(cflags == B.GLTF_COMPONENT_METAL, 1.0, metalness)

    rough = roughness != 0.0
    ggx_val = jnp.where(rough, C.ggx_eval_bsdf(l, v, n, roughness), 0.0)
    ggx_pdf = jnp.where(rough, C.ggx_eval_pdf(l, v, n, roughness), 0.0)
    v_dot_h = jnp.where(rough, dot(v, normalize(v + l)), dot(v, n))

    lam_val = C.lambert_eval_bsdf(l, v, n)
    lam_pdf = C.lambert_eval_pdf(l, v, n)

    f_i = jnp.ones_like(lam_val)
    plastic = (coat_value > 0.0) & (metalness < 1.0) & (fresnel_ior > 0.0)
    f_i_c = C.fr_dielectric_pbrt(jnp.abs(dot(v, n)), 1.0, fresnel_ior)
    f_o = C.fr_dielectric_pbrt(jnp.abs(dot(l, n)), 1.0, fresnel_ior)
    m_fdr_int = md['data'][..., B.GLTF_FLOAT_MI_FDR_INT]
    coeff = lerp(1.0, (1.0 - f_i_c) * (1.0 - f_o)
                 / jnp.maximum(fresnel_ior * fresnel_ior * (1.0 - m_fdr_int), 1e-12),
                 coat_value)
    lam_val = jnp.where(plastic, lam_val * coeff, lam_val)
    f_i = jnp.where(plastic, f_i_c, f_i)

    f_conductor = C.hydra_fresnel_cond(metal_col, v_dot_h, fresnel_ior, roughness)
    specular_color = ggx_val[..., None] * f_conductor

    prob_spec = 0.5 * coat_value
    prob_diff = 1.0 - prob_spec

    dielectric_val = lam_val[..., None] * base_color + (ggx_val * f_i * coat_value)[..., None] * coat_col
    dielectric_pdf = lam_pdf * prob_diff + ggx_pdf * prob_spec

    val = metalness[..., None] * specular_color + (1.0 - metalness)[..., None] * dielectric_val
    pdf = metalness * ggx_pdf + (1.0 - metalness) * dielectric_pdf
    return dict(val=val, pdf=pdf)
