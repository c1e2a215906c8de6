"""Whitted ray tracing + primary-ray pass (reference integrator_rt.cpp).

``ray_trace`` is the mirror-reflection Whitted integrator with a per-light
direct loop (kernel_RayBounce, integrator_rt.cpp:196-283); ``cast_single_ray``
is the flat-color primary pass (CastSingleRay, :420-430).  Deterministic:
rays go through pixel centers, no RNG.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import lmath as LM
from ..ops import texture as TEX
from ..accel import traverse as ACC
from ..bsdf import common as C
from ..bsdf import dispatch as MAT
from ..scene.build import (Scene, SceneMeta, MAT_TYPE_LIGHT_SOURCE,
                           GLTF_COLOR_BASE, GLTF_COLOR_METAL, GLTF_COLOR_COAT,
                           GLTF_FLOAT_ALPHA)
from . import integrator_pt as IPT


def _primary_rays(scene: Scene, meta: SceneMeta, pixel_ids):
    """kernel_InitEyeRay3 (integrator_rt.cpp:55-82): pixel centers."""
    xs = pixel_ids % meta.width
    ys = pixel_ids // meta.width
    x_norm = (xs.astype(jnp.float32) + 0.5) / float(meta.width)
    y_norm = (ys.astype(jnp.float32) + 0.5) / float(meta.height)
    ray_dir = LM.eye_ray_dir_normalized(x_norm, y_norm, scene.proj_inv)
    ray_pos = jnp.zeros_like(ray_dir)
    return LM.transform_ray3f(scene.world_view_inv, ray_pos, ray_dir)


def _intersect(scene, meta, ray_pos, ray_dir, t_max):
    t_min = jnp.zeros(ray_pos.shape[:1], jnp.float32)
    if meta.use_bvh:
        bvh = dict(bmin=scene.bvh_bmin, bmax=scene.bvh_bmax, skip=scene.bvh_skip,
                   tri_offset=scene.bvh_tri_offset, tri_count=scene.bvh_tri_count)
        return ACC.intersect_bvh(bvh, scene.tri_v0, scene.tri_e1, scene.tri_e2,
                                 scene.tri_inst_id, scene.tri_geom_id,
                                 scene.tri_prim_id, ray_pos, ray_dir, t_min, t_max)
    return ACC.intersect_brute(scene.tri_v0, scene.tri_e1, scene.tri_e2,
                               scene.tri_inst_id, scene.tri_geom_id,
                               scene.tri_prim_id, ray_pos, ray_dir, t_min, t_max)


def _shading_data(scene, hit):
    """Barycentric-lerped uv + normal like kernel_RayTrace2/GetRayColor."""
    geom = jnp.maximum(hit.geom_id, 0)
    mv = scene.mat_vert_offset[geom]
    tri_off, vert_off = mv[..., 0], mv[..., 1]
    prim = jnp.maximum(hit.prim_id, 0)
    ia = scene.tri_indices[(tri_off + prim) * 3 + 0] + vert_off
    ib = scene.tri_indices[(tri_off + prim) * 3 + 1] + vert_off
    ic = scene.tri_indices[(tri_off + prim) * 3 + 2] + vert_off
    wa = (1.0 - hit.u - hit.v)[..., None]
    wb = hit.u[..., None]
    wc = hit.v[..., None]
    data = wa * scene.vdata[ia] + wb * scene.vdata[ib] + wc * scene.vdata[ic]
    uv = jnp.stack([data[..., 3], data[..., 7]], -1)
    norm = data[..., 0:3]
    mat_id = scene.mat_id_by_prim[tri_off + prim]
    return uv, norm, mat_id


def cast_single_ray(scene: Scene, meta: SceneMeta, pixel_ids):
    """CastSingleRay + kernel_GetRayColor: flat albedo, no lighting.

    Returns [N, 4] float32 colors.
    """
    ray_pos, ray_dir = _primary_rays(scene, meta, pixel_ids)
    hit = _intersect(scene, meta, ray_pos, ray_dir,
                     jnp.full(ray_pos.shape[:1], LM.FLT_MAX))
    found = hit.geom_id >= 0
    uv, _, mat_id = _shading_data(scene, hit)
    mdata = scene.mat_colors[mat_id][..., GLTF_COLOR_BASE, :]
    tc_t = LM.mul_rows_2x4(scene.mat_row0[mat_id][..., 0, :],
                           scene.mat_row1[mat_id][..., 0, :], uv)
    tex_color = TEX.sample(scene.textures,
                           MAT._clamp_tex(scene, scene.mat_texid[mat_id][..., 0]), tc_t)
    emissive = mdata[..., 3] > 0.0
    color = jnp.where(emissive[..., None],
                      jnp.clip(mdata[..., 3:4], 0.0, 1.0) * jnp.ones((1, 4)),
                      mdata * tex_color)
    color = jnp.where(found[..., None], color, 0.0)
    return color.at[..., 3].set(0.0)


def ray_trace(scene: Scene, meta: SceneMeta, pixel_ids):
    """Whitted RT (integrator_rt.cpp RayTrace, :432-461). Returns [N,4]."""
    N = pixel_ids.shape[0]
    ray_pos, ray_dir = _primary_rays(scene, meta, pixel_ids)
    accum = jnp.zeros((N, 4), jnp.float32).at[..., 3].set(1.0)
    throughput = jnp.ones((N, 4), jnp.float32)
    flags = jnp.zeros((N,), jnp.uint32)

    def bounce(carry, _):
        ray_pos, ray_dir, accum, throughput, flags = carry
        live = (flags & jnp.uint32(C.RAY_FLAG_IS_DEAD)) == 0
        hit = _intersect(scene, meta, ray_pos, ray_dir,
                         jnp.where(live, LM.FLT_MAX, 0.0))
        found = hit.geom_id >= 0
        flags = jnp.where(live & ~found,
                          flags | jnp.uint32(C.RAY_FLAG_IS_DEAD | C.RAY_FLAG_OUT_OF_SCENE),
                          flags)
        live = live & found

        uv, norm_raw, mat_id = _shading_data(scene, hit)
        inst = jnp.maximum(hit.inst_id, 0)
        norm = LM.normalize(LM.mul3x3(scene.norm_matrices[inst], norm_raw))
        flip = jnp.where(LM.dot(ray_dir, norm) > 0.001, -1.0, 1.0)
        norm = flip[..., None] * norm
        hit_pos = ray_pos + (hit.t * (1.0 - 1e-6))[..., None] * ray_dir

        mtype = scene.mat_mtype[mat_id]
        is_light = mtype == jnp.uint32(MAT_TYPE_LIGHT_SOURCE)

        # light hit (integrator_rt.cpp:222-243)
        tc_t = LM.mul_rows_2x4(scene.mat_row0[mat_id][..., 0, :],
                               scene.mat_row1[mat_id][..., 0, :], uv)
        tex_color = TEX.sample(scene.textures,
                               MAT._clamp_tex(scene, scene.mat_texid[mat_id][..., 0]), tc_t)
        light_intensity = scene.mat_colors[mat_id][..., GLTF_COLOR_BASE, :3] * tex_color[..., :3]
        # attenuation from the INSTANCED light's normal (integrator_rt.cpp:
        # 222-243: lightCos = dot(ray_dir, light.norm), atten = lightCos < 0
        # ? 1 : 0 when the instance maps to a light, else 1) — the light id
        # comes through remap_inst like the PT path, so rotated lights work
        lgt_id = scene.remap_inst[
            jnp.clip(inst, 0, scene.remap_inst.shape[0] - 1)][..., 1]
        has_lid = lgt_id >= 0
        lnorm_hit = scene.light_norm[jnp.maximum(lgt_id, 0)][..., :3]
        light_cos = LM.dot(ray_dir, lnorm_hit)
        atten = jnp.where(has_lid, jnp.where(light_cos < 0.0, 1.0, 0.0), 1.0)
        accum_l = accum.at[..., :3].add(
            jnp.where((live & is_light)[..., None],
                      throughput[..., :3] * light_intensity * atten[..., None], 0.0))
        flags = jnp.where(live & is_light,
                          flags | jnp.uint32(C.RAY_FLAG_IS_DEAD | C.RAY_FLAG_HIT_LIGHT),
                          flags)
        live_s = live & ~is_light

        # direct loop over ALL lights (integrator_rt.cpp:245-262)
        shade = jnp.zeros((N, 3), jnp.float32)
        for light_id_static in range(meta.num_lights):
            lid = jnp.full((N,), light_id_static, jnp.int32)
            lpos = scene.light_pos[lid][..., :3]
            lnorm = scene.light_norm[lid][..., :3]
            lint = scene.light_intensity[lid][..., :3]
            hit_dist = jnp.sqrt(jnp.sum((hit_pos - lpos) ** 2, -1))
            sdir = LM.normalize(lpos - hit_pos)
            spos = hit_pos + norm * (jnp.maximum(LM.maxcomp(hit_pos), 1.0) * 5e-6)[..., None]
            if meta.use_bvh:
                bvh = dict(bmin=scene.bvh_bmin, bmax=scene.bvh_bmax,
                           skip=scene.bvh_skip, tri_offset=scene.bvh_tri_offset,
                           tri_count=scene.bvh_tri_count)
                occ = ACC.any_hit_bvh(bvh, scene.tri_v0, scene.tri_e1,
                                      scene.tri_e2, scene.tri_geom_id, spos, sdir,
                                      jnp.zeros((N,)), jnp.where(live_s, hit_dist * 0.9995, 0.0))
            else:
                occ = ACC.any_hit_brute(scene.tri_v0, scene.tri_e1, scene.tri_e2,
                                        scene.tri_geom_id, spos, sdir,
                                        jnp.zeros((N,)), jnp.where(live_s, hit_dist * 0.9995, 0.0))
            visible = ~occ & (LM.dot(sdir, lnorm) < 0.0)
            # MaterialEvalWhitted: lambert * base*tex (integrator_rt.cpp:164-171)
            mat_color = scene.mat_colors[mat_id][..., GLTF_COLOR_BASE, :3] * tex_color[..., :3]
            bsdf = LM.INV_PI * mat_color
            cos_out = jnp.maximum(LM.dot(sdir, norm), 0.0)
            contrib = lint * bsdf * (cos_out / jnp.maximum(hit_dist * hit_dist, 1e-20))[..., None]
            shade = shade + jnp.where((visible & live_s)[..., None], contrib, 0.0)

        # mirror bounce (MaterialSampleWhitted, integrator_rt.cpp:173-193)
        specular = scene.mat_colors[mat_id][..., GLTF_COLOR_METAL, :]
        coat = scene.mat_colors[mat_id][..., GLTF_COLOR_COAT, :]
        alpha = scene.mat_data[mat_id][..., GLTF_FLOAT_ALPHA]
        refl_dir = LM.reflect(ray_dir, norm)
        refl_color = alpha[..., None] * specular + (1.0 - alpha)[..., None] * coat
        cos_theta = LM.dot(refl_dir, norm)

        accum2 = accum_l.at[..., :3].add(
            jnp.where(live_s[..., None], throughput[..., :3] * shade, 0.0))
        new_thr = throughput * (cos_theta[..., None] * refl_color)
        new_pos = LM.offs_ray_pos(hit_pos, norm, refl_dir)

        ls = live_s[..., None]
        return (jnp.where(ls, new_pos, ray_pos),
                jnp.where(ls, refl_dir, ray_dir),
                accum2,
                jnp.where(ls, new_thr, throughput),
                flags), None

    carry = (ray_pos, ray_dir, accum, throughput, flags)
    carry, _ = jax.lax.scan(bounce, carry, None, length=meta.trace_depth)
    return carry[2]
