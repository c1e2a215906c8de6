"""Legacy Hydra glass material (include/cmat_glass.h:234-275 glassSampleAndEval)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.lmath import dot, normalize
from . import common as C
from ..scene import build as B


def _reflect2(d, n):
    return normalize(d - 2.0 * dot(d, n)[..., None] * n)


def _refract2(d, n, relative_ior):
    """cmat_glass.h refract2 (falls back to reflection on TIR)."""
    cosi = dot(d, n)
    eta = 1.0 / relative_ior
    k = 1.0 - eta * eta * (1.0 - cosi * cosi)
    refr = normalize(eta[..., None] * d - (eta * cosi + jnp.sqrt(jnp.maximum(k, 0.0)))[..., None] * n)
    return jnp.where((k < 0)[..., None], _reflect2(d, n), refr)


def _fresnel2(v, n, ior):
    """cmat_glass.h fresnel2."""
    cosi = dot(v, n)
    sint = jnp.sqrt(jnp.maximum(1.0 - cosi * cosi, 0.0)) / ior
    cost = jnp.sqrt(jnp.maximum(1.0 - sint * sint, 0.0))
    rp = (ior * cosi - cost) / jnp.maximum(ior * cosi + cost, 1e-12)
    rs = (cosi - ior * cost) / jnp.maximum(cosi + ior * cost, 1e-12)
    r = 0.5 * (rp * rp + rs * rs)
    return jnp.where(sint > 1.0, 1.0, r)


def sample_and_eval(md, rands, v, n, mis_ior, ray_flags=None):
    """glassSampleAndEval. Uses geomNormal (dispatch passes it), rands.w picks."""
    color_refl = md['colors'][..., B.GLASS_COLOR_REFLECT, :]
    color_transp = md['colors'][..., B.GLASS_COLOR_TRANSP, :]
    ior = md['data'][..., B.GLASS_FLOAT_IOR]

    ray_dir = -v
    relative_ior = ior / mis_ior
    if ray_flags is not None:
        inv_norm = (ray_flags & jnp.uint32(C.RAY_FLAG_HAS_INV_NORMAL)) != 0
        exiting = inv_norm & (mis_ior == ior)
        relative_ior = jnp.where(exiting, 1.0 / ior, relative_ior)

    fres = _fresnel2(v, n, relative_ior)
    pick_refl = rands[..., 3] < fres

    dir_refl = _reflect2(ray_dir, n)
    dir_refr = _refract2(ray_dir, n, relative_ior)

    out_dir = jnp.where(pick_refl[..., None], dir_refl, dir_refr)
    val = jnp.where(pick_refl[..., None], color_refl, color_transp)
    new_ior = jnp.where(pick_refl, mis_ior, ior)
    flags = jnp.where(pick_refl, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_EVENT_S | C.RAY_EVENT_T))

    cos_out = jnp.abs(dot(out_dir, n))
    val = val / jnp.maximum(cos_out, 1e-6)[..., None]
    return dict(val=val, dir=out_dir, pdf=jnp.ones_like(fres), flags=flags,
                ior=new_ior)
