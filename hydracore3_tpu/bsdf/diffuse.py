"""Simple diffuse (Lambert / Oren-Nayar) material (include/cmat_diffuse.h)."""
from __future__ import annotations

import jax.numpy as jnp

from . import common as C
from ..scene import build as B


def sample_and_eval(md, refl_spec, rands, v, n):
    """diffuseSampleAndEval (cmat_diffuse.h:8-24)."""
    cflags = md['cflags']
    lam_dir = C.lambert_sample(rands[..., :2], v, n)
    lam_pdf = C.lambert_eval_pdf(lam_dir, v, n)
    lam_val = C.lambert_eval_bsdf(lam_dir, v, n)
    val = lam_val[..., None] * refl_spec
    on = (cflags & B.GLTF_COMPONENT_ORENNAYAR) != 0
    on_mult = C.orennayar_func(lam_dir, -v, n, md['data'][..., B.DIFFUSE_ROUGHNESS])
    val = jnp.where(on[..., None], val * on_mult[..., None], val)
    return dict(val=val, dir=lam_dir, pdf=lam_pdf,
                flags=jnp.full(lam_pdf.shape, C.RAY_FLAG_HAS_NON_SPEC, jnp.uint32),
                ior=jnp.ones_like(lam_pdf))


def eval(md, refl_spec, l, v, n):
    """diffuseEval (cmat_diffuse.h:27-39)."""
    cflags = md['cflags']
    lam_val = C.lambert_eval_bsdf(l, v, n)
    lam_pdf = C.lambert_eval_pdf(l, v, n)
    on = (cflags & B.GLTF_COMPONENT_ORENNAYAR) != 0
    on_mult = C.orennayar_func(l, v, n, md['data'][..., B.DIFFUSE_ROUGHNESS])
    lam_val = jnp.where(on, lam_val * on_mult, lam_val)
    return dict(val=lam_val[..., None] * refl_spec, pdf=lam_pdf)
