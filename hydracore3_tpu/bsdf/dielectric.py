"""Smooth dielectric material (include/cmat_dielectric.h)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lmath import dot, normalize, coordinate_system_v2
from . import common as C
from ..scene import build as B


def sample_and_eval(md, eta_spec, mis_ior, rands, v, n, ray_flags):
    """dielectricSmoothSampleAndEval (cmat_dielectric.h:8-57)."""
    ext_ior = md['data'][..., B.DIELECTRIC_ETA_EXT]
    inv_norm = (ray_flags & jnp.uint32(C.RAY_FLAG_HAS_INV_NORMAL)) != 0
    n_fixed = jnp.where(inv_norm[..., None], -n, n)

    s, t = coordinate_system_v2(n_fixed)
    wi = jnp.stack([dot(v, s), dot(v, t), dot(v, n_fixed)], -1)
    eta = eta_spec[..., 0] / ext_ior

    r, cos_theta_t, eta_it, eta_ti = C.fr_dielectric_detailed_v2(wi[..., 2], eta)
    t_coef = 1.0 - r

    reflect_pick = rands[..., 0] < r
    wo_refl = jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], -1)
    wo_refr = C.refract_local(wi, cos_theta_t, eta_ti)

    wo = jnp.where(reflect_pick[..., None], wo_refl, wo_refr)
    out_dir = normalize(wo[..., 0:1] * s + wo[..., 1:2] * t + wo[..., 2:3] * n_fixed)

    val_refl = r
    val_refr = (eta_ti * eta_ti) * t_coef
    val = jnp.where(reflect_pick, val_refl, val_refr)
    pdf = jnp.where(reflect_pick, r, t_coef)
    new_ior = jnp.where(reflect_pick, mis_ior,
                        jnp.where(mis_ior == eta_spec[..., 0], ext_ior, eta_spec[..., 0]))
    flags = jnp.where(reflect_pick, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_EVENT_S | C.RAY_EVENT_T))

    val4 = val[..., None] * jnp.ones((1, 4), val.dtype)
    val4 = val4 / jnp.maximum(jnp.abs(dot(out_dir, n_fixed)), 1e-6)[..., None]
    return dict(val=val4, dir=out_dir, pdf=pdf, flags=flags, ior=new_ior)
