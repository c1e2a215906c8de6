"""G-buffer evaluation (reference integrator_gbuffer.cpp).

16 Hammersley samples per pixel -> depth/normal/texcoord/color/ids; the
reduction picks the most-representative sample by pairwise dissimilarity and
derives coverage from sample similarity (GBufferReduction, :206-250).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import lmath as LM
from ..ops import texture as TEX
from ..bsdf import dispatch as MAT
from ..scene.build import Scene, SceneMeta, MAT_TYPE_LIGHT_SOURCE, GLTF_COLOR_BASE
from . import integrator_rt as IRT

GBUFFER_SAMPLES = 16


class GBuffer(NamedTuple):
    depth: jnp.ndarray    # [N]
    norm: jnp.ndarray     # [N,3]
    texc: jnp.ndarray     # [N,2]
    rgba: jnp.ndarray     # [N,4]
    obj_id: jnp.ndarray   # [N] i32 (-1 = none)
    inst_id: jnp.ndarray  # [N] i32
    mat_id: jnp.ndarray   # [N] i32
    coverage: jnp.ndarray # [N]


def plane_hammersley(n: int) -> np.ndarray:
    """PlaneHammersley (integrator_gbuffer.cpp:7-23)."""
    res = np.zeros((n, 2), np.float32)
    for k in range(n):
        u, kk, p = 0.0, k, 0.5
        while kk:
            if kk & 1:
                u += p
            p *= 0.5
            kk >>= 1
        res[k] = (u, (k + 0.5) / n)
    return res


def _eval_samples(scene: Scene, meta: SceneMeta, pixel_ids, offsets):
    """One G-buffer sample per (pixel, offset) pair: [N] rays."""
    xs = pixel_ids % meta.width
    ys = pixel_ids // meta.width
    x_norm = (xs.astype(jnp.float32) + offsets[..., 0]) / float(meta.width)
    y_norm = (ys.astype(jnp.float32) + offsets[..., 1]) / float(meta.height)
    ray_dir = LM.eye_ray_dir_normalized(x_norm, y_norm, scene.proj_inv)
    ray_pos = jnp.zeros_like(ray_dir)
    ray_pos, ray_dir = LM.transform_ray3f(scene.world_view_inv, ray_pos, ray_dir)

    hit = IRT._intersect(scene, meta, ray_pos, ray_dir,
                         jnp.full(ray_pos.shape[:1], LM.FLT_MAX))
    found = hit.geom_id >= 0
    uv, norm_raw, mat_id = IRT._shading_data(scene, hit)
    inst = jnp.maximum(hit.inst_id, 0)
    norm = LM.normalize(LM.mul3x3(scene.norm_matrices[inst], norm_raw))

    tc_t = LM.mul_rows_2x4(scene.mat_row0[mat_id][..., 0, :],
                           scene.mat_row1[mat_id][..., 0, :], uv)
    tex_color = TEX.sample(scene.textures,
                           MAT._clamp_tex(scene, scene.mat_texid[mat_id][..., 0]), tc_t)
    mdata = scene.mat_colors[mat_id][..., GLTF_COLOR_BASE, :]
    color = mdata * tex_color
    is_light = scene.mat_mtype[mat_id] == jnp.uint32(MAT_TYPE_LIGHT_SOURCE)
    color = jnp.where(is_light[..., None], 0.0, color)

    fnd = found[..., None]
    return GBuffer(
        depth=jnp.where(found, hit.t, 0.0),
        norm=jnp.where(fnd, norm, jnp.array([0.0, 0.0, 1.0])),
        texc=jnp.where(fnd, tc_t, 0.0),
        rgba=jnp.where(fnd, color, 0.0),
        obj_id=jnp.where(found, hit.geom_id, -1),
        inst_id=jnp.where(found, hit.inst_id, -1),
        mat_id=jnp.where(found, mat_id, -1),
        coverage=jnp.where(found, 1.0, 0.0))


def _gbuff_diff(s: GBuffer, fov, fw, fh):
    """Pairwise gbuffDiff over the sample axis (integrator_gbuffer.cpp:70-88).

    s fields have shape [N, S]; returns [N, S, S].
    """
    d1 = s.depth[..., :, None]
    d2 = s.depth[..., None, :]
    n1 = s.norm[..., :, None, :]
    n2 = s.norm[..., None, :, :]
    # projectedPixelSize of sample i
    pp = 2.0 * jnp.maximum(fov / fw, fov / fh) * d1
    pp = jnp.where(d1 > 0.0, pp, 1000.0)
    madx = pp * 2.0

    dist = jnp.sqrt(jnp.sum((n1 - n2) ** 2, -1))
    dd = jnp.abs(d1 - d2)
    norm_sim = LM.safe_sqrt(1.0 - dist / 0.15)
    depth_sim = LM.safe_sqrt(1.0 - dd / jnp.maximum(madx, 1e-20))
    similar = jnp.where((dist >= 0.15) | (dd >= madx), 0.0, norm_sim * depth_sim)
    surface_diff = 1.0 - similar

    obj_diff = jnp.where((s.inst_id[..., :, None] == s.inst_id[..., None, :])
                         & (s.obj_id[..., :, None] == s.obj_id[..., None, :]), 0.0, 1.0)
    mat_diff = jnp.where(s.mat_id[..., :, None] == s.mat_id[..., None, :], 0.0, 1.0)
    alpha_diff = jnp.abs(s.rgba[..., :, None, 3] - s.rgba[..., None, :, 3])
    return surface_diff + obj_diff + mat_diff + alpha_diff


def eval_gbuffer(scene: Scene, meta: SceneMeta, pixel_ids) -> GBuffer:
    """EvalGBuffer + GBufferReduction for a batch of pixels."""
    S = GBUFFER_SAMPLES
    offs = jnp.asarray(plane_hammersley(S))
    samples = []
    for k in range(S):
        o = jnp.broadcast_to(offs[k], pixel_ids.shape + (2,))
        samples.append(_eval_samples(scene, meta, pixel_ids, o))
    # stack to [N, S, ...]
    stacked = GBuffer(*[jnp.stack([getattr(s, f) for s in samples], axis=1)
                        for f in GBuffer._fields])

    fw, fh = float(meta.width), float(meta.height)
    diff = _gbuff_diff(stacked, LM.DEG_TO_RAD * 90.0, fw, fh)   # [N,S,S]
    total_diff = jnp.sum(diff, axis=-1)                          # [N,S]
    coverage = jnp.mean(jnp.where(diff < 1.0, 1.0, 0.0), axis=-1)
    best = jnp.argmin(total_diff, axis=-1)                       # [N]
    avg_color = jnp.mean(stacked.rgba, axis=1)

    take = lambda a: jnp.take_along_axis(
        a, best.reshape(best.shape + (1,) * (a.ndim - 1)), axis=1).squeeze(1)
    return GBuffer(
        depth=take(stacked.depth),
        norm=take(stacked.norm),
        texc=take(stacked.texc),
        rgba=avg_color,
        obj_id=take(stacked.obj_id),
        inst_id=take(stacked.inst_id),
        mat_id=take(stacked.mat_id),
        coverage=take(coverage))
