"""Pallas TPU megakernel path tracer (MIS / shadow / naive PT).

The XLA megakernel path (models/integrator_pt.py) fragments each sample pass
into ~200 small fusions of [N]-shaped arrays; per-op fixed cost (~5-10us)
and 1/8-utilized [N,1] layouts dominate the v5e profile (docs/PERF_NOTES.md).
This module re-expresses the whole bounce pipeline as a handful of Pallas
kernels over a *plane* layout:

* every per-ray scalar is an [8,128] f32/u32 tile (1024 rays per grid block);
  vec3/color quantities are [3,8,128] / [4,8,128] (component-major, so each
  elementwise op runs a fully-populated VPU tile);
* ray-triangle intersection runs in [T, R] space (triangles on sublanes,
  rays on lanes) with the Woop unit-triangle transform as MXU matmuls
  [T,4] @ [4,R] and the per-ray shade row fetched by ONE one-hot matmul
  [32,T] @ [T,R] (EmbreeRT.cpp:300-400 is the reference query; the unit
  transform replaces its Moller-Trumbore with an MXU-friendly form);
* texture taps CANNOT live in-kernel (TPU's only fast big-table gather is
  XLA's DMA row gather; Mosaic's dynamic_gather is one (8,128) tile wide),
  so the pass is split per bounce: kernel_b emits (uv, texid), XLA gathers
  the quad-packed texel rows (ops/texture.py layout), kernel_{b+1} does the
  bilinear extraction in-lane and shades.  Scenes whose slot-0 textures all
  fold to constants (scene/build.py mat_tex0_const) skip the taps entirely.

The RNG is the reference-exact crandom.h generator (ops/rng.py) on u32
planes — the uint32->float32 conversion is done in two exact halves because
Mosaic lacks the direct cast — so random streams match the XLA path bit for
bit and goldens stay sharp.

Reference call stack mirrored here: integrator_pt.cpp:719-758 (PathTrace),
:129-157 (InitEyeRay2), :214-348 (RayTrace2), :350-424 (SampleLightSource),
:426-548 (NextBounce), :550-595 (HitEnvironment).
"""
from __future__ import annotations

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.build import (
    Scene, SceneMeta,
    MAT_TYPE_GLTF, MAT_TYPE_DIFFUSE, MAT_TYPE_CONDUCTOR,
    MAT_TYPE_DIELECTRIC, MAT_TYPE_GLASS,
    DIELECTRIC_ETA_EXT, DIELECTRIC_ETA_INT,
    GLASS_COLOR_REFLECT, GLASS_COLOR_TRANSP, GLASS_FLOAT_IOR,
    MAT_TYPE_LIGHT_SOURCE, MTYPE_SMALL_LIGHT,
    GLTF_COLOR_BASE, GLTF_COLOR_COAT, GLTF_COLOR_METAL, EMISSION_COLOR,
    DIFFUSE_COLOR,
    GLTF_FLOAT_MI_FDR_INT, GLTF_FLOAT_ALPHA, GLTF_FLOAT_GLOSINESS,
    GLTF_FLOAT_IOR, GLTF_FLOAT_ROUGH_ORENNAYAR, GLTF_FLOAT_REFL_COAT,
    GLTF_COMPONENT_METAL,
    LIGHT_GEOM_RECT, LIGHT_GEOM_DISC, LIGHT_GEOM_SPHERE, LIGHT_GEOM_DIRECT,
    LIGHT_GEOM_POINT, LIGHT_DIST_LAMBERT, LIGHT_DIST_OMNI,
    INVALID_ID,
)
from ..bsdf import common as C
from ..ops import texture as TEX

S, L = 16, 128         # plane tile: 16 sublanes x 128 lanes = 2048 rays
RBLK = S * L           # rays per grid block
M_PI = math.pi
INV_PI = 1.0 / math.pi
M_TWOPI = 2.0 * math.pi
FLT_MAX = 3.4e38
GEPSILON = 1e-5        # cglobals.h GEPSILON
BIG_I = 0x7FFFFFF0  # python int: jnp scalars would be captured consts in pallas

INTEGRATOR_STUPID_PT = 0
INTEGRATOR_SHADOW_PT = 1
INTEGRATOR_MIS_PT = 2


# ===========================================================================
# plane math helpers (all shapes [S,L] / [3,S,L] / [4,S,L])
# ===========================================================================

def u32_to_f32_exact(u):
    """(float)(uint32) with round-to-nearest — two exact halves summed once
    (Mosaic has no u32->f32 cast; f32(hi)*2^23 is exact, one rounding add)."""
    hi = (u >> 23).astype(jnp.int32).astype(jnp.float32)
    lo = (u & jnp.uint32(0x7FFFFF)).astype(jnp.int32).astype(jnp.float32)
    return hi * 8388608.0 + lo


_RSCALE = np.float32(1.0 / 4294967296.0)


def rng_next(sx, sy):
    """crandom.h NextState on u32 planes; returns (sx', sy', x)."""
    x = sx * jnp.uint32(17) + sy * jnp.uint32(13123)
    nx = (x << 13) ^ x
    ny = sy ^ (x << 7)
    return nx, ny, x


def rng_next_masked(sx, sy, mask):
    nx, ny, x = rng_next(sx, sy)
    return jnp.where(mask, nx, sx), jnp.where(mask, ny, sy), x


def _hash4(x):
    x1 = x * (x * x * jnp.uint32(15731) + jnp.uint32(74323)) + jnp.uint32(871483)
    y1 = x * (x * x * jnp.uint32(13734) + jnp.uint32(37828)) + jnp.uint32(234234)
    z1 = x * (x * x * jnp.uint32(11687) + jnp.uint32(26461)) + jnp.uint32(137589)
    w1 = x * (x * x * jnp.uint32(15707) + jnp.uint32(789221)) + jnp.uint32(1376312589)
    return x1, y1, z1, w1


def rnd_float4(sx, sy, mask=None):
    """rndFloat4_Pseudo: returns (sx, sy, [4,S,L] floats)."""
    if mask is None:
        sx, sy, x = rng_next(sx, sy)
    else:
        sx, sy, x = rng_next_masked(sx, sy, mask)
    a, b, c, d = _hash4(x)
    r = jnp.stack([u32_to_f32_exact(a), u32_to_f32_exact(b),
                   u32_to_f32_exact(c), u32_to_f32_exact(d)]) * _RSCALE
    return sx, sy, r


def rnd_float1(sx, sy, mask=None):
    if mask is None:
        sx, sy, x = rng_next(sx, sy)
    else:
        sx, sy, x = rng_next_masked(sx, sy, mask)
    tmp = x * (x * x * jnp.uint32(15731) + jnp.uint32(74323)) + jnp.uint32(871483)
    return sx, sy, u32_to_f32_exact(tmp) * _RSCALE


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def cross3(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])


def normalize3(a):
    inv = jax.lax.rsqrt(jnp.maximum(dot3(a, a), 1e-30))
    return a * inv


def v3(x, y, z):
    return jnp.stack([x, y, z])


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def acos_poly(x):
    """arccos via Abramowitz-Stegun 4.4.45 (|err| < 2e-8); Mosaic has no
    native acos/atan2."""
    ax = jnp.clip(jnp.abs(x), 0.0, 1.0)
    p = jnp.float32(-0.0012624911)
    p = p * ax + 0.0066700901
    p = p * ax - 0.0170881256
    p = p * ax + 0.0308918810
    p = p * ax - 0.0501743046
    p = p * ax + 0.0889789874
    p = p * ax - 0.2145988016
    p = p * ax + 1.5707963050
    r = p * jnp.sqrt(1.0 - ax)
    return jnp.where(x < 0.0, M_PI - r, r)


def coordinate_system_v2(n):
    """Duff et al. basis (cglobals.h:120-132) on [3,S,L]."""
    nx, ny, nz = n[0], n[1], n[2]
    pos = nz >= 0
    sign = jnp.where(pos, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    s = jnp.stack([jnp.where(pos, nx * nx * a, -nx * nx * a) + 1.0,
                   jnp.where(pos, b, -b),
                   jnp.where(pos, -nx, nx)])
    t = jnp.stack([b, ny * ny * a + sign, -ny])
    return s, t


def reflect3(d, n):
    """LiteMath reflect: d - 2*dot(d,n)*n."""
    return d - 2.0 * dot3(d, n) * n


def lerp(a, b, t):
    return a + (b - a) * t


def map_sample_to_cosine_distribution(r1, r2, direction, hit_norm):
    """power=1 cosine hemisphere sample (cglobals.h:143-181)."""
    sin_phi = jnp.sin(M_TWOPI * r1)
    cos_phi = jnp.cos(M_TWOPI * r1)
    cos_theta = jnp.sqrt(jnp.maximum(1.0 - r2, 1e-20))
    sin_theta = safe_sqrt(1.0 - cos_theta * cos_theta)
    dx = sin_theta * cos_phi
    dy = sin_theta * sin_phi
    dz = cos_theta
    nx, nz_ = coordinate_system_v2(direction)
    ny = nz_
    nz = direction
    res = nx * dx + ny * dy + nz * dz
    inv_sign = jnp.where(dot3(direction, hit_norm) > 0.0, 1.0, -1.0)
    below = inv_sign * dot3(res, hit_norm) < 0.0
    res_flipped = -nx * dx + ny * dy - nz * dz
    return jnp.where(below, res_flipped, res)


def map_samples_to_disc(x, y):
    """cglobals.h:188-231 ([-1,1]^2 -> disc, with the reference's sin/cos
    swap quirk). Returns (px, py)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    zero = (x == 0.0) & (y == 0.0)
    case_x = ax > ay
    sx = jnp.where(x == 0.0, 1.0, x)
    sy = jnp.where(y == 0.0, 1.0, y)
    r = jnp.where(case_x, x, y)
    phi = jnp.where(case_x, (M_PI / 4.0) * (y / sx),
                    (M_PI / 2.0) - (x / sy) * (M_PI / 4.0))
    r = jnp.where(zero, 0.0, r)
    phi = jnp.where(zero, 0.0, phi)
    # NOTE: utils/lmath.py documents the reference quirk; mirror its exact
    # formula so images agree bit-for-bit with the XLA path
    return r * jnp.sin(phi), r * jnp.cos(phi)


def epsilon_of_pos(p3):
    m = jnp.maximum(jnp.maximum(jnp.abs(p3[0]), jnp.maximum(jnp.abs(p3[1]), jnp.abs(p3[2]))),
                    2.0 * GEPSILON)
    return m * GEPSILON


def offs_ray_pos(hit_pos, n, d):
    sign = jnp.where(dot3(d, n) < 0.0, -1.0, 1.0)
    return hit_pos + (sign * epsilon_of_pos(hit_pos)) * n


def maxcomp3(p3):
    return jnp.maximum(p3[0], jnp.maximum(p3[1], p3[2]))


def mis_weight(a, b):
    pa = jnp.where(jnp.isfinite(a), jnp.abs(a), 0.0)
    pb = jnp.where(jnp.isfinite(b), jnp.abs(b), 0.0)
    w = pa / jnp.maximum(pa + pb, 1e-30)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def pdf_a_to_w(pdf_a, dist, cos_t):
    return (pdf_a * dist * dist) / jnp.maximum(cos_t, 1e-30)


def lane_gather(table_row, idx):
    """Per-ray fetch from a <=128-entry table.

    table_row: [128] values; idx: [S,L] int32 in [0,128) — or any [..., L]
    plane stack (the regen finalize path runs stage fns on [NB,S,L]
    planes, so the gather axis must be the LAST axis, not axis 1).
    Lowered to one tpu.dynamic_gather per tile (the only in-register
    gather the hardware has)."""
    tab = jnp.broadcast_to(table_row.reshape(1, L), idx.shape)
    return jnp.take_along_axis(tab, idx, axis=-1)


def plane(x):
    """[S*L]-ish wide vector -> [S,L] plane."""
    return x.reshape(S, L)


def wide(x):
    """[S,L] plane -> [R] wide vector (free relayout)."""
    return x.reshape(RBLK)


# ===========================================================================
# Fresnel / GGX / Lambert (cmaterial.h ports on planes)
# ===========================================================================

def fresnel_slick(cos_t):
    tmp = 1.0 - jnp.abs(cos_t)
    t2 = tmp * tmp
    return t2 * t2 * tmp


def fr_dielectric_pbrt(cos_i, eta_i, eta_t):
    cos_i = jnp.clip(cos_i, -1.0, 1.0)
    entering = cos_i > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    et_s = jnp.where(jnp.abs(et) < 1e-12, 1.0, et)
    ei_s = jnp.where(jnp.abs(ei) < 1e-12, 1.0, ei)
    ci = jnp.abs(cos_i)
    sin_i = safe_sqrt(1.0 - ci * ci)
    sin_t = ei_s / et_s * sin_i
    ct = safe_sqrt(1.0 - sin_t * sin_t)
    d1 = et_s * ci + ei_s * ct
    d2 = ei_s * ci + et_s * ct
    r_parl = (et_s * ci - ei_s * ct) / jnp.where(jnp.abs(d1) < 1e-12, 1.0, d1)
    r_perp = (ei_s * ci - et_s * ct) / jnp.where(jnp.abs(d2) < 1e-12, 1.0, d2)
    r = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(sin_t >= 1.0, 1.0, r)


def ggx_distribution(cos_nh, alpha):
    a2 = alpha * alpha
    nh2 = jnp.clip(cos_nh * cos_nh, 0.0, 1.0)
    den = nh2 * a2 + (1.0 - nh2)
    return a2 / jnp.maximum(M_PI * den * den, 1e-6)


def ggx_geom_shad_mask(cos_n, alpha):
    c2 = jnp.clip(cos_n * cos_n, 0.0, 1.0)
    tan2 = (1.0 - c2) / jnp.maximum(c2, 1e-6)
    return 2.0 / (1.0 + safe_sqrt(1.0 + alpha * alpha * tan2))


def ggx_sample(r1, r2, v, n, roughness):
    rough2 = roughness * roughness
    nx, ny = coordinate_system_v2(n)
    nz = n
    wox = dot3(v, nx)
    woy = dot3(v, ny)
    woz = dot3(v, nz)
    phi = r1 * M_TWOPI
    cos_t = jnp.clip(safe_sqrt((1.0 - r2) / (1.0 + rough2 * rough2 * r2 - r2)), 0.0, 1.0)
    sin_t = safe_sqrt(1.0 - cos_t * cos_t)
    whx = sin_t * jnp.cos(phi)
    why = sin_t * jnp.sin(phi)
    whz = cos_t
    dwh = wox * whx + woy * why + woz * whz
    wix = 2.0 * dwh * whx - wox
    wiy = 2.0 * dwh * why - woy
    wiz = 2.0 * dwh * whz - woz
    return normalize3(nx * wix + ny * wiy + nz * wiz)


def ggx_eval_pdf(l, v, n, roughness):
    dot_nv = dot3(n, v)
    dot_nl = dot3(n, l)
    rough2 = roughness * roughness
    h = normalize3(v + l)
    dot_nh = dot3(n, h)
    dot_hv = dot3(h, v)
    d = ggx_distribution(dot_nh, rough2)
    pdf = d * dot_nh / (4.0 * jnp.maximum(dot_hv, 1e-6))
    return jnp.where((dot_nv < 1e-6) | (dot_nl < 1e-6), 1.0, pdf)


def ggx_eval_bsdf(l, v, n, roughness):
    dot_nv = dot3(n, v)
    dot_nl = dot3(n, l)
    rough2 = roughness * roughness
    h = normalize3(v + l)
    dot_nh = dot3(n, h)
    d = ggx_distribution(dot_nh, rough2)
    g = ggx_geom_shad_mask(dot_nv, rough2) * ggx_geom_shad_mask(dot_nl, rough2)
    val = d * g / jnp.maximum(4.0 * dot_nv * dot_nl, 1e-6)
    bad = (jnp.abs(dot3(l, n)) < 1e-5) | (dot_nv < 1e-6) | (dot_nl < 1e-6)
    return jnp.where(bad, 0.0, val)


def orennayar_func(l, v, n, roughness):
    """cmaterial.h:254-312 on planes."""
    cos_wi = dot3(l, n)
    cos_wo = dot3(v, n)
    sin_wi = safe_sqrt(1.0 - cos_wi * cos_wi)
    sin_wo = safe_sqrt(1.0 - cos_wo * cos_wo)
    sigma = roughness * M_PI * 0.5
    sigma2 = sigma * sigma
    A = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
    B = 0.45 * sigma2 / (sigma2 + 0.09)
    nx, ny = coordinate_system_v2(n)
    nz = n
    wo0 = -dot3(v, nx)
    wo1 = -dot3(v, ny)
    wi0 = -dot3(l, nx)
    wi1 = -dot3(l, ny)

    def sphi(w1, st):
        return jnp.where(st == 0.0, 0.0, jnp.clip(w1 / jnp.where(st == 0.0, 1.0, st), -1, 1))

    def cphi(w0, st):
        return jnp.where(st == 0.0, 1.0, jnp.clip(w0 / jnp.where(st == 0.0, 1.0, st), -1, 1))

    dcos = cphi(wi0, sin_wi) * cphi(wo0, sin_wo) + sphi(wi1, sin_wi) * sphi(wo1, sin_wo)
    maxcos = jnp.where((sin_wi > 1e-4) & (sin_wo > 1e-4), jnp.maximum(0.0, dcos), 0.0)
    wi_big = jnp.abs(cos_wi) > jnp.abs(cos_wo)
    sinalpha = jnp.where(wi_big, sin_wo, sin_wi)
    tanbeta = jnp.where(wi_big, sin_wi / jnp.maximum(jnp.abs(cos_wi), 1e-20),
                        sin_wo / jnp.maximum(jnp.abs(cos_wo), 1e-20))
    return A + B * maxcos * sinalpha * tanbeta


# ===========================================================================
# scene packing
# ===========================================================================

# material lane-table rows (each a [128] float row, per-ray lane_gather)
MF_MTYPE = 0         # small mtype code (MTYPE_SMALL_LIGHT for lights)
MF_CFLAGS = 1
MF_C0 = 2            # colors[0] = base / emission  (4 rows)
MF_C1 = 6            # colors[1] = coat              (4 rows)
MF_C2 = 10           # colors[2] = metal             (4 rows)
MF_DATA = 14         # data[0..7]                    (8 rows)
MF_TEXID = 22
MF_TEXC = 23         # folded slot-0 tex constant    (4 rows)
MF_ROW0 = 27         # slot-0 uv transform row0      (4 rows)
MF_ROW1 = 31         # slot-0 uv transform row1      (4 rows)
MF_SPD0 = 35         # slot-0 SPD id (-1 = none)   [spectral scenes]
MF_SPD1 = 36         # slot-1 SPD id (-1 = none)
MF_NROWS = 37

# light lane-table rows
LF_POS = 0           # 3
LF_NORM = 3          # 3
LF_INT = 6           # 4
LF_MAT = 10          # 3x3 rotation of 'matrix'      (9 rows, row-major)
LF_SIZE = 19         # 2
LF_PDFA = 21
LF_MULT = 22
LF_GEOM = 23
LF_DIST = 24
LF_SPD = 25          # emission SPD id (-1 = none)  [spectral scenes]
LF_NROWS = 26

# tex descriptor lane-table rows
TF_OFF = 0
TF_W = 1
TF_H = 2
TF_FILT = 3
TF_AU = 4
TF_AV = 5
TF_NROWS = 6

# consts vector layout (SMEM f32)
CN_PROJ_INV = 0       # 16
CN_WVI = 16           # 16 (world_view_inv)
CN_CAM_RESP = 32      # 4
CN_ENV_COLOR = 36     # 4
CN_NUM_LIGHTS = 40
CN_WIDTH = 41
CN_HEIGHT = 42
CN_EXPOSURE = 43
CN_ENV_SROW0 = 44     # 4 env sampler matrix row 0
CN_ENV_SROW1 = 48     # 4 env sampler matrix row 1
CN_ENV_TEXID = 52
CN_NROWS = 56


@dataclasses.dataclass(frozen=True)
class MegaPack:
    """Device arrays for the megakernel (one per (scene, meta))."""
    wx: jnp.ndarray       # [T,4] f32 Woop row x
    wy: jnp.ndarray       # [T,4]
    wz: jnp.ndarray       # [T,4]
    shade_t: jnp.ndarray  # [32, T] f32 transposed shade rows (+matid, +lightid)
    mat_lane: jnp.ndarray    # [MF_NROWS, 128]
    light_lane: jnp.ndarray  # [LF_NROWS, 128]
    tex_lane: jnp.ndarray    # [TF_NROWS, 128]
    consts: jnp.ndarray      # [CN_NROWS] f32
    quad_rows: jnp.ndarray   # [Q//8, 128] bf16 quad texel rows (or None)
    n_tris: int
    tex_const: bool
    env_mapped: bool = False  # env lat-long map tapped on ray miss
    mtypes: tuple = None      # scene mat_types_present (KSPEC-style DCE)
    # spectral (KSPEC_SPECTRAL_RENDERING analog): hero-wavelength path with
    # in-kernel SPD + CIE fetches via chunked lane gathers
    spd_lane: jnp.ndarray = None  # [NS, 4, 128] f32: spectrum s, 1nm entry
    #                               128*c + l = value at lambda 360+idx;
    #                               rows NS-3..NS-1 are CIE x,y,z
    spectral: bool = False
    spd_sets: tuple = None    # static candidate SPD ids per fetch site:
    #                           (diff_sids, eta_sids, k_sids, light_sids,
    #                            env_sid, env_mult)


jax.tree_util.register_dataclass(
    MegaPack,
    data_fields=['wx', 'wy', 'wz', 'shade_t', 'mat_lane', 'light_lane',
                 'tex_lane', 'consts', 'quad_rows', 'spd_lane'],
    meta_fields=['n_tris', 'tex_const', 'env_mapped', 'mtypes',
                 'spectral', 'spd_sets'])


def supported(scene: Scene, meta: SceneMeta) -> bool:
    """Static feature gate: the megakernel covers the PT core
    (GLTF/diffuse/conductor/dielectric/glass/emissive materials; rect/disc/
    sphere/point lights; env maps as miss radiance) INCLUDING hero-
    wavelength spectral scenes (SPD diffuse/conductor/light/env fetches
    in-kernel; per-wavelength-IOR dispersion and spectral textures
    excluded).  Motion blur, blend trees, bump maps, 4-texture params,
    IES/spot/projective lights, importance-sampled env and lens cameras
    fall back to the XLA path (kernel-by-kernel parity, just not the
    Pallas pipeline)."""
    if meta.has_motion or meta.has_blend or meta.has_bump:
        return False
    if meta.spectral_mode:
        # hero-wavelength spectral path: SPD + CIE fetches ride chunked
        # lane gathers (<=29 spectra + 3 CIE rows = 32-row table).
        # Per-wavelength IOR (dielectric/glass dispersion) and spectral
        # textures stay on the XLA path.
        if meta.has_spd_tex or meta.has_cam_response_spectra:
            return False
        if meta.has_env_map:
            return False
        if (MAT_TYPE_DIELECTRIC in meta.mat_types_present
                or MAT_TYPE_GLASS in meta.mat_types_present):
            return False
        if int(scene.spec_offset_sz.shape[0]) > 29:
            return False
    if meta.has_four_textures or meta.has_ies or meta.has_spot or meta.has_proj:
        return False
    if meta.env_enable_sam or meta.has_cam_back:
        return False
    if meta.has_env_map:
        # env radiance on miss rides the tap pipeline: needs the quad pool
        # (importance-sampled env / cam-back stay on the XLA path above)
        if scene.textures.quad_texels is None:
            return False
        if scene.textures.offset.shape[0] > 128:
            return False
        if int(scene.textures.quad_texels.shape[0]) > (1 << 21):
            return False
    if meta.use_two_level:
        return False
    if meta.cam_lens_radius > 0.0 or len(meta.lens_lines) > 0:
        return False
    if meta.num_materials > 128 or meta.num_lights > 128 or meta.num_lights < 1:
        return False
    if meta.num_tris < 1 or meta.num_tris > 4096:
        return False
    if meta.trace_depth > 12:
        return False
    allowed = {MAT_TYPE_GLTF, MAT_TYPE_DIFFUSE, MAT_TYPE_CONDUCTOR,
               MAT_TYPE_DIELECTRIC, MAT_TYPE_GLASS, MAT_TYPE_LIGHT_SOURCE}
    if not set(meta.mat_types_present) <= allowed:
        return False
    gt = np.asarray(scene.light_geom_type)
    dt = np.asarray(scene.light_dist_type)
    if not np.isin(gt[:meta.num_lights],
                   [LIGHT_GEOM_RECT, LIGHT_GEOM_DISC, LIGHT_GEOM_SPHERE,
                    LIGHT_GEOM_POINT]).all():
        return False
    if not np.isin(dt[:meta.num_lights],
                   [LIGHT_DIST_LAMBERT, LIGHT_DIST_OMNI]).all():
        return False
    if np.asarray(scene.light_ies_id)[:meta.num_lights].max(initial=-1) >= 0:
        return False
    if not meta.tex0_all_const:
        # textured path: quad-packed pool, <=128 slots, sliding-window pool
        # memory cap (texels * 256B)
        if scene.textures.quad_texels is None:
            return False
        if scene.textures.offset.shape[0] > 128:
            return False
        if int(scene.textures.quad_texels.shape[0]) > (1 << 21):
            return False
    return True


def pack(scene: Scene, meta: SceneMeta) -> MegaPack:
    """Host-side packing of scene tables into megakernel layouts."""
    v0 = np.asarray(scene.tri_v0, np.float64)
    e1 = np.asarray(scene.tri_e1, np.float64)
    e2 = np.asarray(scene.tri_e2, np.float64)
    T = v0.shape[0]
    # pad to the _trace_blocks block size (128) once T exceeds one block —
    # its [T,R] sub-block slices index T in 128-tri steps (a mult-of-8 pad
    # sliced OOB for >4096-tri scenes packed directly, e.g. by the
    # spectral stage-chain oracle tests)
    Tpad = max(8, -(-T // 8) * 8) if T <= 128 else -(-T // 128) * 128

    # Woop unit-triangle transform: M = inv([e1 e2 n]) as columns; ray hits
    # where p + t q = (u, v, 0), p = M(o - v0), q = M d.
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)            # [T,3,3] columns
    det = np.linalg.det(A)
    bad = np.abs(det) < 1e-18
    A[bad] = np.eye(3)
    Minv = np.linalg.inv(A)                        # [T,3,3]
    trans = -np.einsum('tij,tj->ti', Minv, v0)     # [T,3]
    W = np.zeros((Tpad, 3, 4), np.float32)
    W[:T, :, :3] = Minv.astype(np.float32)
    W[:T, :, 3] = trans.astype(np.float32)
    if bad.any():
        # degenerate tris: force q_z = 0 -> invalid
        W[:T][bad] = 0.0
    # padded tris: all-zero rows -> q_z = 0 -> never hit

    shade = np.asarray(scene.tri_shade, np.float32)  # [>=T,32] (matid @24)
    st = np.zeros((32, Tpad), np.float32)
    st[:, :T] = shade[:T].T
    # per-tri light id (remap_inst[inst,1]) baked into row 25 — saves the
    # instance gather in kernel_NextBounce's light-hit branch
    remap = np.asarray(scene.remap_inst)
    inst = np.clip(np.asarray(scene.tri_inst_id)[:T], 0, remap.shape[0] - 1)
    st[25, :T] = remap[inst, 1].astype(np.float32)

    # material lane tables
    M = meta.num_materials
    ml = np.zeros((MF_NROWS, 128), np.float32)
    pf = np.asarray(scene.mat_packed_f32)
    pi = np.asarray(scene.mat_packed_i32)
    for i in range(min(M, 128)):
        mt = np.uint32(pi[i, 0])
        ml[MF_MTYPE, i] = float(MTYPE_SMALL_LIGHT if mt == np.uint32(MAT_TYPE_LIGHT_SOURCE)
                                else mt)
        ml[MF_CFLAGS, i] = float(np.uint32(pi[i, 1]))
        ml[MF_C0:MF_C0 + 4, i] = pf[i, 0:4]
        ml[MF_C1:MF_C1 + 4, i] = pf[i, 4:8]
        ml[MF_C2:MF_C2 + 4, i] = pf[i, 8:12]
        ml[MF_DATA:MF_DATA + 8, i] = pf[i, 48:56]
        t0 = int(np.int64(pi[i, 4]))
        if t0 < 0 or t0 >= scene.textures.offset.shape[0]:
            t0 = 0
        ml[MF_TEXID, i] = float(t0)
        if scene.mat_tex0_const is not None:
            ml[MF_TEXC:MF_TEXC + 4, i] = np.asarray(scene.mat_tex0_const)[i]
        else:
            ml[MF_TEXC:MF_TEXC + 4, i] = 1.0
        ml[MF_ROW0:MF_ROW0 + 4, i] = pf[i, 16:20]
        ml[MF_ROW1:MF_ROW1 + 4, i] = pf[i, 32:36]

    # light lane tables
    ll = np.zeros((LF_NROWS, 128), np.float32)
    nl = meta.num_lights
    ll[LF_POS:LF_POS + 3, :nl] = np.asarray(scene.light_pos)[:nl, :3].T
    ll[LF_NORM:LF_NORM + 3, :nl] = np.asarray(scene.light_norm)[:nl, :3].T
    ll[LF_INT:LF_INT + 4, :nl] = np.asarray(scene.light_intensity)[:nl].T
    lm = np.asarray(scene.light_matrix)[:nl, :3, :3].reshape(nl, 9)
    ll[LF_MAT:LF_MAT + 9, :nl] = lm.T
    ll[LF_SIZE:LF_SIZE + 2, :nl] = np.asarray(scene.light_size)[:nl].T
    ll[LF_PDFA, :nl] = np.asarray(scene.light_pdf_a)[:nl]
    ll[LF_MULT, :nl] = np.asarray(scene.light_mult)[:nl]
    ll[LF_GEOM, :nl] = np.asarray(scene.light_geom_type)[:nl]
    ll[LF_DIST, :nl] = np.asarray(scene.light_dist_type)[:nl]

    # spectral tables (KSPEC_SPECTRAL_RENDERING): per-spectrum 1nm values
    # in 4 chunks of 128 lanes + CIE x/y/z rows; candidate SPD-id sets per
    # fetch site are STATIC so each in-kernel fetch loops only over the
    # spectra that can actually appear there
    spd_lane = None
    spd_sets = None
    spectral = bool(meta.spectral_mode)
    if spectral:
        from ..ops import spectrum as SPEC_OPS
        sv = np.asarray(scene.spec_values, np.float32)
        osz = np.asarray(scene.spec_offset_sz)
        ns = osz.shape[0]
        tab = np.zeros((ns + 3, 4, 128), np.float32)
        for s in range(ns):
            # replicate sample_uniform_spectrum's flat indexing exactly,
            # including XLA's clamp-to-end gather semantics
            idx = np.minimum(osz[s, 0] + np.arange(512), len(sv) - 1)
            tab[s] = sv[idx].reshape(4, 128)
        cie = SPEC_OPS.cie_xyz_table()            # [471, 4] x,y,z,0
        for c in range(3):
            row = np.zeros(512, np.float32)
            row[:471] = cie[:, c]
            tab[ns + c] = row.reshape(4, 128)
        spd_lane = jnp.asarray(tab)

        spdid = np.asarray(scene.mat_spdid)[:M]
        mt = np.asarray(scene.mat_packed_i32)[:M, 0]
        ml[MF_SPD0, :M] = spdid[:, 0]
        ml[MF_SPD1, :M] = spdid[:, 1]
        lspd = np.asarray(scene.light_spec_id)[:nl]
        ll[LF_SPD, :nl] = lspd

        def sids(mask, col):
            u = np.unique(spdid[mask, col])
            return tuple(int(x) for x in u if x >= 0)

        spd_sets = (
            sids(mt == MAT_TYPE_DIFFUSE, 0),              # diffuse refl
            sids(mt == MAT_TYPE_CONDUCTOR, 0),            # conductor eta
            sids(mt == MAT_TYPE_CONDUCTOR, 1),            # conductor k
            tuple(int(x) for x in np.unique(lspd) if x >= 0),  # lights
            int(np.asarray(scene.env_spec_id)),           # env (scalar)
            float(np.asarray(scene.env_spec_mult)),
        )

    # texture descriptor lane tables
    tl = np.zeros((TF_NROWS, 128), np.float32)
    ntex = min(int(scene.textures.offset.shape[0]), 128)
    tl[TF_OFF, :ntex] = np.asarray(scene.textures.offset)[:ntex]
    tl[TF_W, :ntex] = np.asarray(scene.textures.width)[:ntex]
    tl[TF_H, :ntex] = np.asarray(scene.textures.height)[:ntex]
    tl[TF_FILT, :ntex] = np.asarray(scene.textures.filter)[:ntex]
    tl[TF_AU, :ntex] = np.asarray(scene.textures.addr_u)[:ntex]
    tl[TF_AV, :ntex] = np.asarray(scene.textures.addr_v)[:ntex]

    consts = np.zeros((CN_NROWS,), np.float32)
    consts[CN_PROJ_INV:CN_PROJ_INV + 16] = np.asarray(scene.proj_inv).reshape(-1)
    consts[CN_WVI:CN_WVI + 16] = np.asarray(scene.world_view_inv).reshape(-1)
    consts[CN_CAM_RESP:CN_CAM_RESP + 4] = np.asarray(scene.cam_response_rgb)
    consts[CN_ENV_COLOR:CN_ENV_COLOR + 4] = np.asarray(scene.env_color)
    consts[CN_NUM_LIGHTS] = meta.num_lights
    consts[CN_WIDTH] = meta.width
    consts[CN_HEIGHT] = meta.height
    consts[CN_EXPOSURE] = meta.exposure_mult
    env_mapped = bool(meta.has_env_map)
    if env_mapped:
        consts[CN_ENV_SROW0:CN_ENV_SROW0 + 4] = np.asarray(scene.env_sam_row0)
        consts[CN_ENV_SROW1:CN_ENV_SROW1 + 4] = np.asarray(scene.env_sam_row1)
        consts[CN_ENV_TEXID] = float(max(int(scene.env_tex_id), 0))

    tex_const = bool(meta.tex0_all_const)
    quad_rows = None
    if not tex_const or env_mapped:
        # sliding-window quad pool: row i = quads[i..i+7] concatenated, so
        # EVERY ray's gathered 128-lane row has its own 2x2 footprint at
        # lanes 0:16 — no per-ray slot extraction in-kernel (Mosaic's only
        # per-lane gather is one (8,128) tile wide).  8x quad memory (256B
        # per texel), bounded by supported()'s 2^21-texel cap.
        q = np.asarray(scene.textures.quad_texels, np.float32)  # [Q,16]
        # corner-major (c00 c10 c01 c11 x 4ch) -> channel-major (r: 4
        # corners, g, b, a): the in-kernel extraction is then 16 column
        # slices + a weighted sum on planes, no per-ray relayout
        q = q.reshape(-1, 4, 4).transpose(0, 2, 1).reshape(-1, 16)
        Q = q.shape[0]
        qp = np.concatenate([q, np.zeros((8, 16), np.float32)], axis=0)
        idx = np.arange(Q)[:, None] + np.arange(8)[None, :]
        quad_rows = jnp.asarray(qp[idx].reshape(Q, 128)).astype(jnp.bfloat16)

    return MegaPack(
        wx=jnp.asarray(W[:, 0, :]), wy=jnp.asarray(W[:, 1, :]),
        wz=jnp.asarray(W[:, 2, :]),
        shade_t=jnp.asarray(st),
        mat_lane=jnp.asarray(ml), light_lane=jnp.asarray(ll),
        tex_lane=jnp.asarray(tl), consts=jnp.asarray(consts),
        quad_rows=quad_rows, n_tris=int(Tpad), tex_const=tex_const,
        env_mapped=env_mapped, mtypes=tuple(meta.mat_types_present),
        spd_lane=spd_lane, spectral=spectral, spd_sets=spd_sets)


# ===========================================================================
# stage functions (pure jnp over planes — run identically inside Pallas
# kernels and under plain XLA jit, which is how they are unit-tested)
# ===========================================================================

def fetch_mat(ml, mid):
    """Per-ray material fields from the lane table ([MF_NROWS,128])."""
    g = lambda r: lane_gather(ml[r], mid)
    return dict(
        mtype=g(MF_MTYPE), cflags=g(MF_CFLAGS),
        c0=jnp.stack([g(MF_C0 + i) for i in range(4)]),
        c1=jnp.stack([g(MF_C1 + i) for i in range(4)]),
        c2=jnp.stack([g(MF_C2 + i) for i in range(4)]),
        data=[g(MF_DATA + i) for i in range(8)],
        texid=g(MF_TEXID),
        texc=jnp.stack([g(MF_TEXC + i) for i in range(4)]),
        row0=[g(MF_ROW0 + i) for i in range(4)],
        row1=[g(MF_ROW1 + i) for i in range(4)],
        spd0=g(MF_SPD0).astype(jnp.int32),
        spd1=g(MF_SPD1).astype(jnp.int32))


def fetch_light(ll, lid):
    g = lambda r: lane_gather(ll[r], lid)
    return dict(
        pos=jnp.stack([g(LF_POS + i) for i in range(3)]),
        norm=jnp.stack([g(LF_NORM + i) for i in range(3)]),
        intensity=jnp.stack([g(LF_INT + i) for i in range(4)]),
        mat=[g(LF_MAT + i) for i in range(9)],
        size=[g(LF_SIZE), g(LF_SIZE + 1)],
        pdf_a=g(LF_PDFA), mult=g(LF_MULT),
        geom=g(LF_GEOM).astype(jnp.int32), dist=g(LF_DIST).astype(jnp.int32),
        spd=g(LF_SPD).astype(jnp.int32))


def mul3x3_rows(m9, p3):
    """rotate [3,S,L] by per-ray 3x3 (rows m9[0..8])."""
    return jnp.stack([
        m9[0] * p3[0] + m9[1] * p3[1] + m9[2] * p3[2],
        m9[3] * p3[0] + m9[4] * p3[1] + m9[5] * p3[2],
        m9[6] * p3[0] + m9[7] * p3[1] + m9[8] * p3[2]])


def _is_dead(flags):
    return (flags & jnp.uint32(C.RAY_FLAG_IS_DEAD)) != 0


def _has_non_spec(flags):
    return (flags & jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC)) != 0


def stage_init(consts, xs, ys, rngx, rngy, mask=None, spectral=False):
    """kernel_InitEyeRay2 (integrator_pt.cpp:129-157) minus DoF.

    mask: optional liveness plane — only masked lanes advance their RNG
    (the regeneration pipeline re-inits individual lanes mid-flight).
    spectral: draw hero wavelengths (rnd_spec AFTER the pixel draw,
    matching kernel_init_eye_ray's RNG order)."""
    rngx, rngy, r4 = rnd_float4(rngx, rngy, mask)
    lam = None
    if spectral:
        rngx, rngy, uw = rnd_float1(rngx, rngy, mask)
        lam = sample_wavelengths_plane(uw)
    width = consts[CN_WIDTH]
    height = consts[CN_HEIGHT]
    fx = xs + r4[0]
    fy = ys + r4[1]
    xn = fx / width
    yn = fy / height
    # eyeRayDirNormalized (cglobals.h:49-55): proj_inv @ (2x-1, 2y-1, 0, 1)
    pi_ = consts
    nx = 2.0 * xn - 1.0
    ny = 2.0 * yn - 1.0
    px = pi_[CN_PROJ_INV + 0] * nx + pi_[CN_PROJ_INV + 1] * ny + pi_[CN_PROJ_INV + 3]
    py = pi_[CN_PROJ_INV + 4] * nx + pi_[CN_PROJ_INV + 5] * ny + pi_[CN_PROJ_INV + 7]
    pz = pi_[CN_PROJ_INV + 8] * nx + pi_[CN_PROJ_INV + 9] * ny + pi_[CN_PROJ_INV + 11]
    pw = pi_[CN_PROJ_INV + 12] * nx + pi_[CN_PROJ_INV + 13] * ny + pi_[CN_PROJ_INV + 15]
    inv_w = 1.0 / jnp.where(pw == 0.0, 1.0, pw)
    d = normalize3(jnp.stack([px * inv_w, py * inv_w, pz * inv_w]))
    # TransformRay3f (cglobals.h:254-263): transform (0,0,0) and 100*d
    m = consts

    def mul4x3(v3_):
        return jnp.stack([
            m[CN_WVI + 0] * v3_[0] + m[CN_WVI + 1] * v3_[1] + m[CN_WVI + 2] * v3_[2] + m[CN_WVI + 3],
            m[CN_WVI + 4] * v3_[0] + m[CN_WVI + 5] * v3_[1] + m[CN_WVI + 6] * v3_[2] + m[CN_WVI + 7],
            m[CN_WVI + 8] * v3_[0] + m[CN_WVI + 9] * v3_[1] + m[CN_WVI + 10] * v3_[2] + m[CN_WVI + 11]])

    o = mul4x3(jnp.zeros_like(d))
    p2 = mul4x3(100.0 * d)
    d = normalize3(p2 - o)
    zeros = jnp.zeros_like(xs)
    st = dict(
        o=o, d=d, flags=jnp.zeros(xs.shape, jnp.uint32),
        accum=jnp.zeros((4,) + xs.shape, jnp.float32),
        thr=jnp.ones((4,) + xs.shape, jnp.float32),
        mis_pdf=jnp.ones_like(xs), mis_ior=jnp.ones_like(xs),
        hit_pos=jnp.zeros((3,) + xs.shape, jnp.float32),
        hit_norm=jnp.zeros((3,) + xs.shape, jnp.float32),
        hit_uv=jnp.zeros((2,) + xs.shape, jnp.float32),
        hit_dist=zeros, hit_lgt=zeros - 1.0,
        rngx=rngx, rngy=rngy)
    if spectral:
        st['lam'] = lam
    return st


def _trace_blocks(pk_wx, pk_wy, pk_wz, shade_t, n_tris, o, d, tmin, tmax,
                  any_hit=False):
    """Woop-transform intersection in [T,R] space.

    o,d: [3,sb,128]; tmin/tmax: [sb,128].  Nearest-hit returns
    (t, u, v, sh) with sh [32,R] one-hot-fetched shade rows; any-hit
    returns the occlusion plane.  Matches intersect_brute's comparisons
    (accel/traverse.py:38-95): u>=0, v>=0, u+v<=1, tmin<t<tmax."""
    shp = o.shape[1:]
    R = shp[0] * shp[1]
    ones_r = jnp.ones((R,), jnp.float32)
    rhs_o = jnp.stack([o[0].reshape(R), o[1].reshape(R), o[2].reshape(R), ones_r])
    rhs_d = jnp.stack([d[0].reshape(R), d[1].reshape(R), d[2].reshape(R),
                       jnp.zeros((R,), jnp.float32)])
    tminw = jnp.stack([tmin.reshape(R)])    # [1,R]
    tmaxw = jnp.stack([tmax.reshape(R)])

    TB = min(n_tris, 128)
    n_blk = -(-n_tris // TB)

    if any_hit:
        occ = jnp.zeros((1, R), bool)
    else:
        best_t = jnp.full((1, R), FLT_MAX, jnp.float32)
        best_u = jnp.zeros((R,), jnp.float32)
        best_v = jnp.zeros((R,), jnp.float32)
        best_sh = jnp.zeros((32, R), jnp.float32)

    f32 = jnp.float32
    # shade-row fetch matmul precision: Mosaic's DEFAULT f32 dot is one
    # bf16 pass; the f32-emulation passes of HIGHEST stay EXACT for a
    # one-hot select (disjoint-mantissa decomposition sums losslessly)
    hi = jax.lax.Precision.HIGHEST
    for b in range(n_blk):
        lo = b * TB
        wxb = jax.lax.slice_in_dim(pk_wx, lo, lo + TB, axis=0)
        wyb = jax.lax.slice_in_dim(pk_wy, lo, lo + TB, axis=0)
        wzb = jax.lax.slice_in_dim(pk_wz, lo, lo + TB, axis=0)

        # Woop transform as VPU FMAs ([T,1] columns broadcast against
        # [1,R] ray rows): exact f32 and 3x faster than the MXU HIGHEST
        # emulation for these latency-bound tiny matmuls (v5e measured
        # 65us vs 188us per 131k-ray trace)
        def tf(w, rhs):
            return (w[:, 0:1] * rhs[0:1] + w[:, 1:2] * rhs[1:2]
                    + w[:, 2:3] * rhs[2:3] + w[:, 3:4] * rhs[3:4])

        po_x = tf(wxb, rhs_o)
        pd_x = tf(wxb, rhs_d)
        po_y = tf(wyb, rhs_o)
        pd_y = tf(wyb, rhs_d)
        po_z = tf(wzb, rhs_o)
        pd_z = tf(wzb, rhs_d)
        # no explicit det guard: pd_z==0 yields inf/nan t and every
        # comparison below rejects inf-t/nan-t lanes (IEEE semantics)
        t = -po_z / pd_z
        u = po_x + t * pd_x
        v = po_y + t * pd_y
        valid = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tminw) & (t < tmaxw))
        if any_hit:
            occ = occ | jnp.any(valid, axis=0, keepdims=True)
            continue
        tm = jnp.where(valid, t, FLT_MAX)
        bt = jnp.min(tm, axis=0, keepdims=True)                  # [1,R]
        ii = jax.lax.broadcasted_iota(jnp.int32, (TB, R), 0)
        li = jnp.min(jnp.where(tm == bt, ii, BIG_I), axis=0, keepdims=True)
        oh = ((ii == li) & valid).astype(f32)                    # [TB,R]
        shb = jnp.dot(jax.lax.slice_in_dim(shade_t, lo, lo + TB, axis=1),
                      oh, preferred_element_type=f32,
                      precision=hi)  # [32,R]; the f32-emulation passes
        # stay EXACT for a one-hot select (disjoint-mantissa decomposition)
        # u/v NaN-scrub BEFORE the one-hot sum: degenerate/padded Woop rows
        # produce t = 0/0 -> NaN u/v, and 0 * NaN = NaN would contaminate
        # every ray whose winner shares a 128-tri block with one (only
        # multi-block scenes, >128 tris — the 24-tri Cornell never saw it)
        ub = jnp.sum(oh * jnp.where(valid, u, 0.0), axis=0)
        vb = jnp.sum(oh * jnp.where(valid, v, 0.0), axis=0)
        closer = bt < best_t                                     # [1,R]
        best_sh = jnp.where(closer, shb, best_sh)                # bcast [32,R]
        best_u = jnp.where(closer[0], ub, best_u)
        best_v = jnp.where(closer[0], vb, best_v)
        best_t = jnp.minimum(best_t, bt)

    if any_hit:
        # i1 vectors can't be shape-cast on TPU; round-trip through i32
        return occ[0].astype(jnp.int32).reshape(shp) != 0
    return (best_t[0].reshape(shp), best_u.reshape(shp), best_v.reshape(shp),
            best_sh)


def stage_trace(pk_wx, pk_wy, pk_wz, shade_t, n_tris, st, bounce,
                prim=None):
    """kernel_RayTrace2 (integrator_pt.cpp:214-348): nearest hit + baked
    shade-row lerp + normal flip + flag packing.  Returns (st, uv, texid
    not included — texid is fetched by the caller from the mat table).

    bounce: static int in the per-bounce chain; None in regeneration mode,
    where `prim` (bool plane: lane is tracing its camera ray) replaces the
    bounce==0 test for the PRIME_RAY_MISS flag."""
    shp = st['o'].shape[1:]
    live = ~_is_dead(st['flags'])
    tmin = jnp.zeros(shp, jnp.float32)
    tmax = jnp.where(live, FLT_MAX, 0.0)
    t, u, v, sh32 = _trace_blocks(pk_wx, pk_wy, pk_wz, shade_t, n_tris,
                                  st['o'], st['d'], tmin, tmax)
    found = t < FLT_MAX * 0.5
    hit_pos = st['o'] + (t * (1.0 - 1e-6)) * st['d']
    shr = [sh32[j].reshape(shp) for j in range(26)]
    wa = 1.0 - u - v
    data = [wa * shr[j] + u * shr[8 + j] + v * shr[16 + j] for j in range(8)]
    hit_norm = normalize3(jnp.stack(data[0:3]))
    hit_uv = jnp.stack([data[3], data[7]])
    mid = jnp.floor(shr[24] + 0.5).astype(jnp.int32)
    lgt = jnp.floor(shr[25] + 0.5)

    flip = jnp.where(dot3(st['d'], hit_norm) > 0.001, -1.0, 1.0)
    hit_norm = flip * hit_norm
    flags = st['flags']
    inv_flag = jnp.uint32(C.RAY_FLAG_HAS_INV_NORMAL)
    flags = jnp.where(flip < 0.0, flags | inv_flag, flags & ~inv_flag)
    flags_hit = ((flags & jnp.uint32(0xFF000000))
                 | (mid.astype(jnp.uint32) & jnp.uint32(0x00FFFFFF)))
    if prim is None:
        miss_add = jnp.uint32(C.RAY_FLAG_IS_DEAD | C.RAY_FLAG_OUT_OF_SCENE
                              | (C.RAY_FLAG_PRIME_RAY_MISS if bounce == 0
                                 else 0))
        flags_miss = st['flags'] | miss_add
    else:
        flags_miss = (st['flags']
                      | jnp.uint32(C.RAY_FLAG_IS_DEAD
                                   | C.RAY_FLAG_OUT_OF_SCENE)
                      | jnp.where(prim,
                                  jnp.uint32(C.RAY_FLAG_PRIME_RAY_MISS),
                                  jnp.uint32(0)))
    new_flags = jnp.where(live, jnp.where(found, flags_hit, flags_miss),
                          st['flags'])
    keep = ~live | ~found
    st = dict(st)
    st['flags'] = new_flags
    st['hit_pos'] = jnp.where(keep, st['hit_pos'], hit_pos)
    st['hit_norm'] = jnp.where(keep, st['hit_norm'], hit_norm)
    st['hit_uv'] = jnp.where(keep, st['hit_uv'], hit_uv)
    st['hit_dist'] = jnp.where(keep, st['hit_dist'], t)
    st['hit_lgt'] = jnp.where(keep, st['hit_lgt'], lgt)
    return st


def stage_tap_prep(tex_lane, md, st):
    """uv -> quad-row index + bilinear corner weights (the in-kernel half of
    ops/texture.py _sample_quad; the gather itself runs in XLA between
    kernels).  Returns (qidx i32 plane, w4 [4,S,L])."""
    texid = md['texid'].astype(jnp.int32)
    uvx, uvy = st['hit_uv'][0], st['hit_uv'][1]
    tcx = md['row0'][0] * uvx + md['row0'][1] * uvy + md['row0'][3]
    tcy = md['row1'][0] * uvx + md['row1'][1] * uvy + md['row1'][3]
    return _uv_to_quad(tex_lane, texid, tcx, tcy)


def stage_env_tap_prep(consts, tex_lane, d):
    """Miss-direction -> env lat-long tap (sphereMapTo2DTexCoord,
    cglobals.h:335-358, + the env sampler matrix).  Returns (qidx, w4)."""
    x = d[2]
    y = d[0]
    z = -d[1]
    theta = acos_poly(jnp.clip(z, -1.0, 1.0))
    phi = jnp.arctan2(y, x)
    phi = jnp.where(phi < 0.0, phi + M_TWOPI, phi)
    u = jnp.clip(phi * 0.5 * INV_PI, 0.0, 1.0)
    v = jnp.clip(theta * INV_PI, 0.0, 1.0)
    tcx = consts[CN_ENV_SROW0 + 0] * u + consts[CN_ENV_SROW0 + 1] * v \
        + consts[CN_ENV_SROW0 + 3]
    tcy = consts[CN_ENV_SROW1 + 0] * u + consts[CN_ENV_SROW1 + 1] * v \
        + consts[CN_ENV_SROW1 + 3]
    texid = jnp.full(u.shape, consts[CN_ENV_TEXID]).astype(jnp.int32)
    return _uv_to_quad(tex_lane, texid, tcx, tcy)


def _uv_to_quad(tex_lane, texid, tcx, tcy):
    g = lambda r: lane_gather(tex_lane[r], texid)
    off = g(TF_OFF)
    wf = g(TF_W)
    hf = g(TF_H)
    filt = g(TF_FILT)
    au = g(TF_AU)
    av = g(TF_AV)

    def norm_coord(uc, mode):
        wrapped = uc - jnp.floor(uc)
        clamped = jnp.clip(uc, 0.0, 1.0)
        half = 0.5 * uc
        m2 = 2.0 * (half - jnp.floor(half))
        mirrored = jnp.where(m2 < 1.0, m2, 2.0 - m2)
        return jnp.where(mode == TEX.ADDR_WRAP, wrapped,
               jnp.where(mode == TEX.ADDR_MIRROR, mirrored, clamped))

    ffx = norm_coord(tcx, au) * wf - 0.5
    ffy = norm_coord(tcy, av) * hf - 0.5
    is_wrap_u = au == TEX.ADDR_WRAP
    is_wrap_v = av == TEX.ADDR_WRAP
    ffx = jnp.where(is_wrap_u, ffx, jnp.clip(ffx, 0.0, wf - 1.0))
    ffy = jnp.where(is_wrap_v, ffy, jnp.clip(ffy, 0.0, hf - 1.0))
    px = jnp.floor(ffx)
    py = jnp.floor(ffy)
    fx = ffx - px
    fy = ffy - py
    wx = jnp.where(px < 0.0, wf - 1.0, px)
    wy = jnp.where(py < 0.0, hf - 1.0, py)
    qidx = (off + wy * wf + wx).astype(jnp.int32)
    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = fx * (1.0 - fy)
    w01 = (1.0 - fx) * fy
    w11 = fx * fy
    # FILTER_NEAREST: int(u*w) is one of the quad corners (texture.py:208)
    right = (fx >= 0.5).astype(jnp.float32)
    down = (fy >= 0.5).astype(jnp.float32)
    n00 = (1.0 - right) * (1.0 - down)
    n10 = right * (1.0 - down)
    n01 = (1.0 - right) * down
    n11 = right * down
    lin = filt == TEX.FILTER_LINEAR
    w4 = jnp.stack([jnp.where(lin, w00, n00), jnp.where(lin, w10, n10),
                    jnp.where(lin, w01, n01), jnp.where(lin, w11, n11)])
    return qidx, w4


def tex_from_rows(q16, w4):
    """In-kernel bilinear from pre-transposed quad planes.

    q16: [16,sb,128] (f32-castable) channel-major quad planes (r corners,
    g, b, a) — the ray-major [N,16] -> plane transpose happens in XLA
    between kernels (in-kernel column slices of a [R,16] array measured
    15us EACH on v5e; the XLA transpose of the whole tile is ~20us).
    w4: [4,sb,128] corner-weight planes (recomputed by the consumer from
    state).  Returns tex color [4,sb,128]."""
    qp = q16.astype(jnp.float32)
    return jnp.stack([qp[c * 4 + 0] * w4[0] + qp[c * 4 + 1] * w4[1]
                      + qp[c * 4 + 2] * w4[2] + qp[c * 4 + 3] * w4[3]
                      for c in range(4)])


# ===========================================================================
# material eval/sample (GLTF + diffuse, cmat_gltf.h / cmat_diffuse.h ports)
# ===========================================================================

def _gltf_params(md, base4):
    cflags = md['cflags']
    metal_col = md['c2'] * base4
    coat_col = md['c1']
    roughness = jnp.clip(1.0 - md['data'][GLTF_FLOAT_GLOSINESS], 0.0, 1.0)
    metalness = md['data'][GLTF_FLOAT_ALPHA]
    coat = md['data'][GLTF_FLOAT_REFL_COAT]
    ior = md['data'][GLTF_FLOAT_IOR]
    metalness = jnp.where(cflags == float(GLTF_COMPONENT_METAL), 1.0,
                          metalness)
    return cflags, metal_col, coat_col, roughness, metalness, coat, ior


def hydra_fresnel_cond(f0_4, v_dot_h, ior):
    fr = f0_4 + (1.0 - f0_4) * fresnel_slick(v_dot_h)
    return jnp.where(ior == 0.0, f0_4, fr)


def _present(mtypes, t):
    """KSPEC-style static feature test: mtypes is the scene's
    mat_types_present tuple (None = assume everything; the reference's
    kernel_slicer dead-code-eliminates absent material branches the same
    way, integrator_pt.h:601-622)."""
    return mtypes is None or t in mtypes


def mat_eval(md, tex_color, l, v, n, mtypes=None, spec=None, lam=None):
    """MaterialEval for {GLTF, DIFFUSE} (integrator_pt_mat.cpp:308-528).

    Returns (val [4,S,L], pdf [S,L]); ``mtypes`` statically removes
    absent-material branches from the kernel.  ``spec``/``lam`` switch the
    diffuse reflectance and conductor eta/k to per-wavelength SPD samples
    (bsdf/dispatch.py:315-370 spectral branches)."""
    base4 = md['c0'] * tex_color
    mtype = md['mtype']
    lam_val = jnp.full(mtype.shape, INV_PI, jnp.float32)
    lam_pdf = jnp.abs(dot3(l, n)) * INV_PI

    val = jnp.zeros_like(base4)
    pdf = jnp.zeros_like(lam_pdf)

    if _present(mtypes, MAT_TYPE_GLTF):
        # ---- gltfEval (cmat_gltf.h:94-147) -------------------------------
        _, metal_col, coat_col, roughness, metalness, coat, ior = \
            _gltf_params(md, base4)
        rough = roughness != 0.0
        ggx_val = jnp.where(rough, ggx_eval_bsdf(l, v, n, roughness), 0.0)
        ggx_pdf = jnp.where(rough, ggx_eval_pdf(l, v, n, roughness), 0.0)
        v_dot_h = jnp.where(rough, dot3(v, normalize3(v + l)), dot3(v, n))
        plastic = (coat > 0.0) & (metalness < 1.0) & (ior > 0.0)
        f_i_c = fr_dielectric_pbrt(jnp.abs(dot3(v, n)), 1.0, ior)
        f_o = fr_dielectric_pbrt(jnp.abs(dot3(l, n)), 1.0, ior)
        fdr = md['data'][GLTF_FLOAT_MI_FDR_INT]
        coeff = lerp(jnp.ones_like(coat), (1.0 - f_i_c) * (1.0 - f_o)
                     / jnp.maximum(ior * ior * (1.0 - fdr), 1e-12), coat)
        lam_val_g = jnp.where(plastic, lam_val * coeff, lam_val)
        f_i = jnp.where(plastic, f_i_c, jnp.ones_like(f_i_c))
        f_cond = hydra_fresnel_cond(metal_col, v_dot_h, ior)
        spec_col = ggx_val * f_cond
        prob_spec = 0.5 * coat
        prob_diff = 1.0 - prob_spec
        diel_val = lam_val_g * base4 + (ggx_val * f_i * coat) * coat_col
        diel_pdf = lam_pdf * prob_diff + ggx_pdf * prob_spec
        g_val = metalness * spec_col + (1.0 - metalness) * diel_val
        g_pdf = metalness * ggx_pdf + (1.0 - metalness) * diel_pdf
        is_gltf = mtype == float(MAT_TYPE_GLTF)
        val = jnp.where(is_gltf, g_val, val)
        pdf = jnp.where(is_gltf, g_pdf, pdf)

    if _present(mtypes, MAT_TYPE_DIFFUSE):
        # ---- diffuseEval (cmat_diffuse.h:27-39) --------------------------
        on = (md['cflags'].astype(jnp.int32) & 16) != 0  # ORENNAYAR
        on_mult = orennayar_func(l, v, n, md['data'][0])
        d_scal = jnp.where(on, lam_val * on_mult, lam_val)
        is_diff = mtype == float(MAT_TYPE_DIFFUSE)
        if spec is None:
            diff_base = base4
        else:
            # spectral: SPD reflectance, NO slot-0 texture multiply
            # (bsdf/dispatch.py:328-331)
            spd, sets = spec
            diff_base = spd_or_color(spd, sets[0], md['spd0'], lam, md['c0'])
        val = jnp.where(is_diff, d_scal * diff_base, val)
        pdf = jnp.where(is_diff, lam_pdf, pdf)

    if _present(mtypes, MAT_TYPE_CONDUCTOR):
        # ---- conductorRoughEval (cmat_conductor.h:105-137) ---------------
        eta_s = kk_s = None
        if spec is not None:
            spd, sets = spec
            eta_s = spd_or_color(spd, sets[1], md['spd0'], lam,
                                 jnp.stack([md['data'][2]] * 4))
            kk_s = spd_or_color(spd, sets[2], md['spd1'], lam,
                                jnp.stack([md['data'][3]] * 4))
        c_val, c_pdf = conductor_eval(md, tex_color, l, v, n,
                                      eta=eta_s, kk=kk_s)
        is_cond = mtype == float(MAT_TYPE_CONDUCTOR)
        val = jnp.where(is_cond, c_val, val)
        pdf = jnp.where(is_cond, c_pdf, pdf)
    return val, pdf


def safe_sqrt_pl(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def dielectric_sample(md, rands, v, n, ray_flags, mis_ior):
    """dielectricSmoothSampleAndEval (cmat_dielectric.h:8-57) in plane form
    (non-spectral: eta from data[DIELECTRIC_ETA_INT]).

    Returns dict(val [4], dir [3], pdf, flags u32, ior)."""
    ext_ior = md['data'][DIELECTRIC_ETA_EXT]
    eta_int = md['data'][DIELECTRIC_ETA_INT]
    inv_norm = (ray_flags & jnp.uint32(C.RAY_FLAG_HAS_INV_NORMAL)) != 0
    n_fixed = jnp.where(inv_norm, -n, n)

    s, t = coordinate_system_v2(n_fixed)
    wi = jnp.stack([dot3(v, s), dot3(v, t), dot3(v, n_fixed)])
    eta = eta_int / ext_ior

    # FrDielectricDetailedV2 (cmaterial.h:646-683)
    ci = jnp.clip(wi[2], -1.0, 1.0)
    outside = ci >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    cos_t_sqr = 1.0 - (1.0 - ci * ci) * eta_ti * eta_ti
    ci_abs = jnp.abs(ci)
    ct_abs = safe_sqrt_pl(cos_t_sqr)
    a_s = (-eta_it * ct_abs + ci_abs) / jnp.maximum(eta_it * ct_abs + ci_abs,
                                                    1e-12)
    a_p = (-eta_it * ci_abs + ct_abs) / jnp.maximum(eta_it * ci_abs + ct_abs,
                                                    1e-12)
    r = 0.5 * (a_s * a_s + a_p * a_p)
    special = (eta == 1.0) | (ci_abs == 0.0)
    r = jnp.where(special, jnp.where(eta == 1.0, 0.0, 1.0), r)
    cos_theta_t = jnp.where(ci >= 0.0, -ct_abs, ct_abs)
    t_coef = 1.0 - r

    reflect_pick = rands[0] < r
    wo_refl = jnp.stack([-wi[0], -wi[1], wi[2]])
    wo_refr = jnp.stack([-eta_ti * wi[0], -eta_ti * wi[1],
                         jnp.broadcast_to(cos_theta_t, wi[0].shape)])
    wo = jnp.where(reflect_pick, wo_refl, wo_refr)
    out_dir = normalize3(wo[0:1] * s + wo[1:2] * t + wo[2:3] * n_fixed)

    val = jnp.where(reflect_pick, r, (eta_ti * eta_ti) * t_coef)
    pdf = jnp.where(reflect_pick, r, t_coef)
    new_ior = jnp.where(reflect_pick, mis_ior,
                        jnp.where(mis_ior == eta_int, ext_ior, eta_int))
    flags = jnp.where(reflect_pick, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_EVENT_S | C.RAY_EVENT_T))
    val4 = (val / jnp.maximum(jnp.abs(dot3(out_dir, n_fixed)), 1e-6)
            )[None] * jnp.ones((4, 1, 1), jnp.float32)
    return dict(val=val4, dir=out_dir, pdf=pdf, flags=flags, ior=new_ior)


def glass_sample(md, rands, v, n, ray_flags, mis_ior):
    """glassSampleAndEval (cmat_glass.h:234-275) in plane form; n is the
    pre-bump hit normal (the dispatch's geom-normal convention,
    bsdf/dispatch.py:297).  rands[3] picks reflect/refract."""
    color_refl = md['c0']
    color_transp = md['c1']
    ior = md['data'][GLASS_FLOAT_IOR]

    ray_dir = jnp.stack([-v[0], -v[1], -v[2]])
    relative_ior = ior / mis_ior
    inv_norm = (ray_flags & jnp.uint32(C.RAY_FLAG_HAS_INV_NORMAL)) != 0
    exiting = inv_norm & (mis_ior == ior)
    relative_ior = jnp.where(exiting, 1.0 / ior, relative_ior)

    # fresnel2
    cosi = dot3(v, n)
    sint = safe_sqrt_pl(1.0 - cosi * cosi) / relative_ior
    cost = safe_sqrt_pl(1.0 - sint * sint)
    rp = (relative_ior * cosi - cost) / jnp.maximum(
        relative_ior * cosi + cost, 1e-12)
    rs = (cosi - relative_ior * cost) / jnp.maximum(
        cosi + relative_ior * cost, 1e-12)
    fres = jnp.where(sint > 1.0, 1.0, 0.5 * (rp * rp + rs * rs))
    pick_refl = rands[3] < fres

    def reflect2(d):
        return normalize3(d - (2.0 * dot3(d, n)) * n)

    dir_refl = reflect2(ray_dir)
    # refract2 (TIR falls back to reflection)
    cosi_d = dot3(ray_dir, n)
    eta2 = 1.0 / relative_ior
    k = 1.0 - eta2 * eta2 * (1.0 - cosi_d * cosi_d)
    refr = normalize3(eta2 * ray_dir - (eta2 * cosi_d + safe_sqrt_pl(k)) * n)
    dir_refr = jnp.where(k < 0.0, dir_refl, refr)

    out_dir = jnp.where(pick_refl, dir_refl, dir_refr)
    val = jnp.where(pick_refl, color_refl, color_transp)
    new_ior = jnp.where(pick_refl, mis_ior, ior)
    flags = jnp.where(pick_refl, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_EVENT_S | C.RAY_EVENT_T))
    cos_out = jnp.abs(dot3(out_dir, n))
    val = val / jnp.maximum(cos_out, 1e-6)
    return dict(val=val, dir=out_dir, pdf=jnp.ones_like(fres), flags=flags,
                ior=new_ior)


def mat_sample(md, tex_color, rands, v, n, ray_flags=None, mis_ior=None,
               mtypes=None, spec=None, lam=None):
    """MaterialSampleAndEval for {GLTF, DIFFUSE, CONDUCTOR, DIELECTRIC,
    GLASS} (cmat_gltf.h:6-91, cmat_diffuse.h:8-24, cmat_dielectric.h,
    cmat_glass.h).  rands: [4,S,L].  ``mtypes`` (the scene's static
    mat_types_present) removes absent material branches from the kernel —
    the r4 regression was these branches running unconditionally.

    Returns dict(val [4], dir [3], pdf, flags u32, ior)."""
    base4 = md['c0'] * tex_color
    mtype = md['mtype']

    lam_dir = map_sample_to_cosine_distribution(rands[0], rands[1], n, n)
    lam_pdf = jnp.abs(dot3(lam_dir, n)) * INV_PI
    lam_val = jnp.full(lam_pdf.shape, INV_PI, jnp.float32)

    up = jnp.stack([jnp.zeros_like(lam_pdf), jnp.ones_like(lam_pdf),
                    jnp.zeros_like(lam_pdf)])
    out_dir = up
    out_val = jnp.zeros_like(base4)
    out_pdf = jnp.ones_like(lam_pdf)
    out_flags = jnp.full(lam_pdf.shape, 0, jnp.uint32)

    if _present(mtypes, MAT_TYPE_GLTF):
        cflags, metal_col, coat_col, roughness, metalness, coat, ior = \
            _gltf_params(md, base4)
        smooth = roughness == 0.0
        perf_refl = reflect3(-v, n)
        cos_out = dot3(perf_refl, n)
        mirror_val = jnp.where(cos_out <= 1e-6, 0.0,
                               1.0 / jnp.maximum(cos_out, 1e-6))
        ggx_dir_r = ggx_sample(rands[0], rands[1], v, n, roughness)
        ggx_dir = jnp.where(smooth, perf_refl, ggx_dir_r)
        ggx_pdf = jnp.where(smooth, 1.0,
                            ggx_eval_pdf(ggx_dir_r, v, n, roughness))
        ggx_val = jnp.where(smooth, mirror_val,
                            ggx_eval_bsdf(ggx_dir_r, v, n, roughness))

        pick_metal = rands[2] < metalness
        v_dot_h = dot3(v, normalize3(v + ggx_dir))
        metal_bsdf = ggx_val * metalness * hydra_fresnel_cond(
            metal_col, v_dot_h, ior)
        spec_flags = jnp.where(smooth, jnp.uint32(C.RAY_EVENT_S),
                               jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC))

        f_i = fr_dielectric_pbrt(jnp.abs(dot3(v, n)), 1.0, ior)
        prob_spec = 0.5 * coat
        prob_diff = 1.0 - prob_spec
        pick_spec = rands[3] < prob_spec
        coat_bsdf = (ggx_val * (1.0 - metalness) * f_i * coat) * coat_col
        lam_bsdf = (lam_val * (1.0 - metalness)) * base4
        fdr = md['data'][GLTF_FLOAT_MI_FDR_INT]
        f_o = fr_dielectric_pbrt(jnp.abs(dot3(lam_dir, n)), 1.0, ior)
        coeff = lerp(jnp.ones_like(coat), (1.0 - f_i) * (1.0 - f_o)
                     / jnp.maximum(ior * ior * (1.0 - fdr), 1e-12), coat)
        apply_coat = (coat > 0.0) & (ior > 0.0)
        lam_bsdf = jnp.where(apply_coat, lam_bsdf * coeff, lam_bsdf)

        g_dir = jnp.where(pick_metal | pick_spec, ggx_dir, lam_dir)
        g_val = jnp.where(pick_metal, metal_bsdf,
                          jnp.where(pick_spec, coat_bsdf, lam_bsdf))
        g_pdf = jnp.where(pick_metal, ggx_pdf,
                          jnp.where(pick_spec, ggx_pdf, lam_pdf))
        g_flags = jnp.where(pick_metal | pick_spec, spec_flags,
                            jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC))
        pdf_sel = jnp.where(pick_metal, metalness,
                            (1.0 - metalness)
                            * jnp.where(pick_spec, prob_spec, prob_diff))
        is_gltf = mtype == float(MAT_TYPE_GLTF)
        out_dir = jnp.where(is_gltf, g_dir, out_dir)
        out_val = jnp.where(is_gltf, g_val, out_val)
        out_pdf = jnp.where(is_gltf, g_pdf * pdf_sel, out_pdf)
        out_flags = jnp.where(is_gltf, g_flags, out_flags)

    if _present(mtypes, MAT_TYPE_DIFFUSE):
        # diffuseSampleAndEval (NB the reference's OrenNayar quirk: -v)
        on = (md['cflags'].astype(jnp.int32) & 16) != 0
        on_mult = orennayar_func(lam_dir, -v, n, md['data'][0])
        d_scal = jnp.where(on, lam_val * on_mult, lam_val)
        if spec is None:
            diff_base = base4
        else:
            spd, sets = spec
            diff_base = spd_or_color(spd, sets[0], md['spd0'], lam, md['c0'])
        d_val = d_scal * diff_base
        d_flags = jnp.full(lam_pdf.shape, C.RAY_FLAG_HAS_NON_SPEC, jnp.uint32)
        is_diff = mtype == float(MAT_TYPE_DIFFUSE)
        out_dir = jnp.where(is_diff, lam_dir, out_dir)
        out_val = jnp.where(is_diff, d_val, out_val)
        out_pdf = jnp.where(is_diff, lam_pdf, out_pdf)
        out_flags = jnp.where(is_diff, d_flags, out_flags)

    if _present(mtypes, MAT_TYPE_CONDUCTOR):
        # conductor (cmat_conductor.h:7-103)
        eta_s = kk_s = None
        if spec is not None:
            spd, sets = spec
            eta_s = spd_or_color(spd, sets[1], md['spd0'], lam,
                                 jnp.stack([md['data'][2]] * 4))
            kk_s = spd_or_color(spd, sets[2], md['spd1'], lam,
                                jnp.stack([md['data'][3]] * 4))
        cs = conductor_sample(md, tex_color, rands[0], rands[1], v, n,
                              eta=eta_s, kk=kk_s)
        is_cond = mtype == float(MAT_TYPE_CONDUCTOR)
        out_dir = jnp.where(is_cond, cs['dir'], out_dir)
        out_val = jnp.where(is_cond, cs['val'], out_val)
        out_pdf = jnp.where(is_cond, cs['pdf'], out_pdf)
        out_flags = jnp.where(is_cond, cs['flags'], out_flags)

    out_ior = mis_ior if mis_ior is not None else jnp.ones_like(lam_pdf)
    if ray_flags is not None and mis_ior is not None:
        if _present(mtypes, MAT_TYPE_DIELECTRIC):
            ds = dielectric_sample(md, rands, v, n, ray_flags, mis_ior)
            is_diel = mtype == float(MAT_TYPE_DIELECTRIC)
            out_dir = jnp.where(is_diel, ds['dir'], out_dir)
            out_val = jnp.where(is_diel, ds['val'], out_val)
            out_pdf = jnp.where(is_diel, ds['pdf'], out_pdf)
            out_flags = jnp.where(is_diel, ds['flags'], out_flags)
            out_ior = jnp.where(is_diel, ds['ior'], out_ior)
        if _present(mtypes, MAT_TYPE_GLASS):
            gs = glass_sample(md, rands, v, n, ray_flags, mis_ior)
            is_glass = mtype == float(MAT_TYPE_GLASS)
            out_dir = jnp.where(is_glass, gs['dir'], out_dir)
            out_val = jnp.where(is_glass, gs['val'], out_val)
            out_pdf = jnp.where(is_glass, gs['pdf'], out_pdf)
            out_flags = jnp.where(is_glass, gs['flags'], out_flags)
            out_ior = jnp.where(is_glass, gs['ior'], out_ior)
    return dict(val=out_val, dir=out_dir, pdf=out_pdf, flags=out_flags,
                ior=out_ior)


# ---------------------------------------------------------------------------
# Conductor (include/cmat_conductor.h) — Trowbridge-Reitz + complex Fresnel
# in plane form. Local-frame vectors are [3,S,L] stacks.
# ---------------------------------------------------------------------------

def _abscos_l(w):
    return jnp.abs(w[2])


def _sin2_l(w):
    return jnp.maximum(0.0, 1.0 - w[2] * w[2])


def _tan2_l(w):
    return _sin2_l(w) / jnp.maximum(w[2] * w[2], 1e-20)


def _cossin_phi_l(w):
    st = safe_sqrt(_sin2_l(w))
    cp = jnp.where(st == 0.0, 1.0, jnp.clip(w[0] / jnp.where(st == 0.0, 1.0, st), -1, 1))
    sp = jnp.where(st == 0.0, 0.0, jnp.clip(w[1] / jnp.where(st == 0.0, 1.0, st), -1, 1))
    return cp, sp


def tr_d_p(wm, a0, a1):
    """trD (cmaterial.h:460-470)."""
    tan2 = _sin2_l(wm) / (wm[2] * wm[2])      # inf when cos == 0
    cos4 = (wm[2] * wm[2]) ** 2
    cp, sp = _cossin_phi_l(wm)
    e = tan2 * ((cp / a0) ** 2 + (sp / a1) ** 2)
    val = 1.0 / (M_PI * a0 * a1 * cos4 * (1 + e) * (1 + e))
    return jnp.where((cos4 < 1e-16) | ~jnp.isfinite(tan2), 0.0, val)


def tr_lambda_p(w, a0, a1):
    tan2 = _tan2_l(w)
    cp, sp = _cossin_phi_l(w)
    a2 = (cp * a0) ** 2 + (sp * a1) ** 2
    val = (safe_sqrt(1.0 + a2 * tan2) - 1.0) / 2.0
    return jnp.where(jnp.isfinite(tan2), val, 0.0)


def tr_g1_p(w, a0, a1):
    return 1.0 / (1.0 + tr_lambda_p(w, a0, a1))


def tr_g_p(wo, wi, a0, a1):
    return 1.0 / (1.0 + tr_lambda_p(wo, a0, a1) + tr_lambda_p(wi, a0, a1))


def tr_pdf_p(w, wm, a0, a1):
    return (tr_g1_p(w, a0, a1) / jnp.maximum(_abscos_l(w), 1e-20)
            * tr_d_p(wm, a0, a1) * jnp.abs(dot3(w, wm)))


def tr_sample_p(wo, r0, r1, a0, a1):
    """trSample VNDF (cmaterial.h:506-530) on local-frame planes."""
    wh = normalize3(jnp.stack([a0 * wo[0], a1 * wo[1], wo[2]]))
    wh = jnp.where(wh[2] < 0.0, -wh, wh)
    # t1 = normalize(cross(z, wh)) unless wh ~ z
    t1 = jnp.stack([-wh[1], wh[0], jnp.zeros_like(wh[0])])
    t1n = normalize3(t1)
    near_z = wh[2] >= 0.99999
    t1 = jnp.stack([jnp.where(near_z, 1.0, t1n[0]),
                    jnp.where(near_z, 0.0, t1n[1]),
                    jnp.zeros_like(wh[0])])
    t2 = cross3(wh, t1)
    pr = safe_sqrt(r0)
    th = M_TWOPI * r1
    px = pr * jnp.cos(th)
    py0 = pr * jnp.sin(th)
    h = safe_sqrt(1.0 - px * px)
    py = lerp(h, py0, (1.0 + wh[2]) / 2.0)
    pz = safe_sqrt(jnp.maximum(0.0, 1.0 - px * px - py * py))
    nh = t1 * px + t2 * py + wh * pz
    return normalize3(jnp.stack([a0 * nh[0], a1 * nh[1],
                                 jnp.maximum(1e-6, nh[2])]))


def fr_complex_cond(cos_i, eta, k):
    """FrComplexConductor (cmaterial.h:685-694) in real arithmetic
    (Mosaic has no complex dtype). eta_c = eta + i*k."""
    def cdiv(ar, ai, br, bi):
        d = br * br + bi * bi
        d = jnp.where(d == 0.0, 1e-30, d)
        return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d

    def csqrt(xr, xi):
        m = jnp.sqrt(xr * xr + xi * xi)
        u = jnp.sqrt(jnp.maximum((m + xr) * 0.5, 0.0))
        v = jnp.sqrt(jnp.maximum((m - xr) * 0.5, 0.0))
        return u, jnp.where(xi < 0.0, -v, v)

    sin2 = 1.0 - cos_i * cos_i
    e2r = eta * eta - k * k
    e2i = 2.0 * eta * k
    str_, sti = cdiv(sin2, jnp.zeros_like(sin2), e2r, e2i)   # sin2 / eta_c^2
    ctr, cti = csqrt(1.0 - str_, -sti)
    ecr = eta * cos_i
    eci = k * cos_i
    pr_r, pr_i = cdiv(ecr - ctr, eci - cti, ecr + ctr, eci + cti)
    sr_r, sr_i = cdiv(cos_i - (eta * ctr - k * cti),
                      -(eta * cti + k * ctr),
                      cos_i + (eta * ctr - k * cti),
                      (eta * cti + k * ctr))
    return 0.5 * (pr_r * pr_r + pr_i * pr_i + sr_r * sr_r + sr_i * sr_i)


def _local_frame(v, n):
    nx, ny = coordinate_system_v2(n)
    return nx, ny, n


def _to_local(vv, nx, ny, nz):
    return jnp.stack([dot3(vv, nx), dot3(vv, ny), dot3(vv, nz)])


def conductor_sample(md, tex_color, r0, r1, v, n, eta=None, kk=None):
    """conductorSmooth/RoughSampleAndEval (cmat_conductor.h:7-103).

    eta/kk default to the scalar material constants; spectral scenes pass
    per-wavelength [4,S,L] planes (broadcasts through the Fresnel math
    like the XLA path's eta_spec/k_spec [N,4])."""
    refl = md['c0']                         # CONDUCTOR_COLOR slot
    if eta is None:
        eta = md['data'][2]
    if kk is None:
        kk = md['data'][3]
    a0 = jnp.minimum(md['data'][0], tex_color[0])
    a1 = jnp.minimum(md['data'][1], tex_color[1])
    smooth = jnp.maximum(md['data'][1], md['data'][0]) < 1e-3

    perf = reflect3(-v, n)
    cos_out = dot3(perf, n)
    fr_s = fr_complex_cond(jnp.clip(cos_out, -1.0, 1.0), eta, kk)
    sm_val = jnp.where(cos_out <= 1e-6, 0.0, fr_s / jnp.maximum(cos_out, 1e-6))
    sm_val4 = sm_val * refl

    nx, ny, nz = _local_frame(v, n)
    wo = _to_local(v, nx, ny, nz)
    wm = tr_sample_p(wo, r0, r1, a0, a1)
    wi = reflect3(-wo, wm)
    same = wo[2] * wi[2] >= 0.0
    cos_o = _abscos_l(wo)
    cos_i = _abscos_l(wi)
    fr_m = fr_complex_cond(jnp.clip(jnp.abs(dot3(wo, wm)), -1.0, 1.0), eta, kk)
    d = tr_d_p(wm, a0, a1)
    g = tr_g_p(wo, wi, a0, a1)
    rough_val = fr_m * d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-20)
    bad = ~same | (cos_i == 0.0) | (cos_o == 0.0) | (wo[2] == 0.0)
    rough_val = jnp.where(bad, 0.0, rough_val)
    rough_val4 = rough_val * refl
    rough_dir = normalize3(nx * wi[0] + ny * wi[1] + nz * wi[2])
    rough_pdf = tr_pdf_p(wo, wm, a0, a1) / jnp.maximum(4.0 * jnp.abs(dot3(wo, wm)), 1e-20)
    rough_pdf = jnp.where(bad, 1.0, rough_pdf)
    up = jnp.stack([jnp.zeros_like(cos_o), jnp.ones_like(cos_o),
                    jnp.zeros_like(cos_o)])
    rough_dir = jnp.where(bad, up, rough_dir)

    val = jnp.where(smooth, sm_val4, rough_val4)
    out_dir = jnp.where(smooth, perf, rough_dir)
    pdf = jnp.where(smooth, 1.0, rough_pdf)
    flags = jnp.where(smooth, jnp.uint32(C.RAY_EVENT_S),
                      jnp.uint32(C.RAY_FLAG_HAS_NON_SPEC))
    return dict(val=val, dir=out_dir, pdf=pdf, flags=flags)


def conductor_eval(md, tex_color, l, v, n, eta=None, kk=None):
    """conductorRoughEval (cmat_conductor.h:105-137); smooth -> zero."""
    refl = md['c0']
    if eta is None:
        eta = md['data'][2]
    if kk is None:
        kk = md['data'][3]
    a0 = jnp.minimum(md['data'][0], tex_color[0])
    a1 = jnp.minimum(md['data'][1], tex_color[1])
    smooth = jnp.maximum(md['data'][1], md['data'][0]) < 1e-3
    nx, ny, nz = _local_frame(v, n)
    wo = _to_local(v, nx, ny, nz)
    wi = _to_local(l, nx, ny, nz)
    same = wo[2] * wi[2] >= 0.0
    wm0 = wo + wi
    wm_ok = dot3(wm0, wm0) > 0.0
    wm = normalize3(wm0)
    cos_o = _abscos_l(wo)
    cos_i = _abscos_l(wi)
    fr_m = fr_complex_cond(jnp.clip(jnp.abs(dot3(wo, wm)), -1.0, 1.0), eta, kk)
    d = tr_d_p(wm, a0, a1)
    g = tr_g_p(wo, wi, a0, a1)
    val = fr_m * d * g / jnp.maximum(4.0 * cos_i * cos_o, 1e-20)
    wm_ff = jnp.where(wm[2] < 0.0, -wm, wm)
    pdf = tr_pdf_p(wo, wm_ff, a0, a1) / jnp.maximum(4.0 * jnp.abs(dot3(wo, wm_ff)), 1e-20)
    bad = smooth | ~same | ~wm_ok | (cos_i == 0.0) | (cos_o == 0.0)
    return jnp.where(bad, 0.0, val) * refl, jnp.where(bad, 0.0, pdf)


# ===========================================================================
# lights (clight.h / integrator_pt_lgt.cpp ports)
# ===========================================================================

def light_sample_rev(ld, r0, r1, illum_point):
    """LightSampleRev for rect/disc/sphere/point (clight.h:67-126)."""
    gt = ld['geom']
    off_rx = 2.0 * (r0 - 0.5) * ld['size'][0]
    off_rz = 2.0 * (r1 - 0.5) * ld['size'][1]
    dx, dz = map_samples_to_disc(r0 * 2.0 - 1.0, r1 * 2.0 - 1.0)
    is_disc = gt == LIGHT_GEOM_DISC
    off_x = jnp.where(is_disc, dx * ld['size'][0], off_rx)
    off_z = jnp.where(is_disc, dz * ld['size'][0], off_rz)
    local = jnp.stack([off_x, jnp.zeros_like(off_x), off_z])
    area_pos = (mul3x3_rows(ld['mat'], local) + ld['pos']
                + epsilon_of_pos(ld['pos']) * ld['norm'])

    theta = M_TWOPI * r0
    phi = acos_poly(jnp.clip(1.0 - 2.0 * r1, -1.0, 1.0))
    sph_dir = jnp.stack([jnp.sin(phi) * jnp.cos(theta),
                         jnp.sin(phi) * jnp.sin(theta),
                         jnp.cos(phi)])
    sph_pos = ld['pos'] + (ld['size'][0] * 1.000001) * sph_dir
    sph_norm = normalize3(sph_pos - ld['pos'])

    is_sph = gt == LIGHT_GEOM_SPHERE
    is_pt = gt == LIGHT_GEOM_POINT
    pos = jnp.where(is_sph, sph_pos, jnp.where(is_pt, ld['pos'], area_pos))
    norm = jnp.where(is_sph, sph_norm, ld['norm'])
    is_omni = is_pt & (ld['dist'] == LIGHT_DIST_OMNI)
    return pos, norm, is_omni


def light_eval_pdf(ld, illum_point, ray_dir, lpos, lnorm):
    """LightEvalPDF (integrator_pt_lgt.cpp:71-107), no env/IES."""
    gt = ld['geom']
    diff = illum_point - lpos
    hit_dist = jnp.sqrt(dot3(diff, diff))
    cos_tmp = dot3(ray_dir, -lnorm)
    dir_to_v = normalize3(lpos - illum_point)
    cos_sphere = jnp.abs(dot3(dir_to_v, lnorm))
    cos_point = jnp.where(ld['dist'] == LIGHT_DIST_LAMBERT,
                          jnp.maximum(cos_tmp, 0.0), 1.0)
    cos_area = jnp.maximum(cos_tmp, 0.0)
    cos_val = jnp.where(gt == LIGHT_GEOM_SPHERE, cos_sphere,
              jnp.where(gt == LIGHT_GEOM_POINT, cos_point, cos_area))
    return pdf_a_to_w(ld['pdf_a'], hit_dist, cos_val)


def light_intensity(ld, spec=None, lam=None):
    """LightIntensity, no IES/spot/projective/env texture; with ``spec``
    (spectral scenes) the emission rides the light's SPD
    (integrator_pt_lgt.cpp:109-173 spectral branch)."""
    color = ld['intensity']
    if spec is not None:
        spd, sets = spec
        color = spd_or_color(spd, sets[3], ld['spd'], lam, color)
    return color * ld['mult']


# ===========================================================================
# spectral fetches (KSPEC_SPECTRAL_RENDERING analog, ops/spectrum.py twins)
# ===========================================================================
# SPD values live in [NS, 4, 128] chunk rows; a per-lane fetch is 4 chunked
# lane gathers selected by idx>>7, looped over the STATIC candidate-SPD set
# of the fetch site (the slot's unique SPD ids, computed at pack time) —
# the spectral analog of the mat_types_present dead-code elimination.

def _lam_chunk_gather(spd_row4, idx):
    """Per-lane value from one spectrum's [4,128] chunk rows; idx [S,L]
    int32 in [0,512)."""
    off = idx & 127
    c = idx >> 7
    v = lane_gather(spd_row4[0], off)
    for ci in range(1, 4):
        v = jnp.where(c == ci, lane_gather(spd_row4[ci], off), v)
    return v


def spd_sample(spd, cand, sid, lam):
    """sample_uniform_spectrum (ops/spectrum.py:50-63) on one wavelength
    plane.  cand: static tuple of SPD ids possible at this site; sid [S,L]
    i32; lam [S,L] f32.  Lanes whose sid is not in cand return 0."""
    idx1 = jnp.clip(lam - 360.0, 0.0, 469.0).astype(jnp.int32)
    idx2 = jnp.minimum(idx1 + 1, 469)
    x1 = 360.0 + idx1.astype(jnp.float32)
    out = jnp.zeros_like(lam)
    for s in cand:
        y1 = _lam_chunk_gather(spd[s], idx1)
        y2 = _lam_chunk_gather(spd[s], idx2)
        out = jnp.where(sid == s, y1 + (lam - x1) * (y2 - y1), out)
    return out


def spd_or_color(spd, cand, sid, lam4, color4):
    """[4,S,L]: per-wavelength SPD sample where sid >= 0, else the RGBA
    color rows as-is (the XLA path's where(spectral & has_spd, ...))."""
    has = sid >= 0
    return jnp.stack([
        jnp.where(has, spd_sample(spd, cand, sid, lam4[j]), color4[j])
        for j in range(4)])


def cie_fetch(spd, row, lam):
    """CIE curve value at round(lam) (spectrum_to_xyz indexing; row is the
    STATIC table row NS-3+k); out-of-range wavelengths contribute 0."""
    off = (jnp.floor(lam + 0.5) - 360.0).astype(jnp.int32)
    valid = (off >= 0) & (off < 471)
    v = _lam_chunk_gather(spd[row], jnp.clip(off, 0, 470))
    return jnp.where(valid, v, 0.0)


def sample_wavelengths_plane(u):
    """Stratified hero wavelengths on planes (ops/spectrum.py:38-48)."""
    a, b = 360.0, 830.0
    l0 = a + (b - a) * u
    delta = (b - a) / 4.0
    waves = [l0]
    for _ in range(1, 4):
        nxt = waves[-1] + delta
        waves.append(jnp.where(nxt > b, a + (nxt - b), nxt))
    return jnp.stack(waves)


def spectral_contrib(spec, st, accum):
    """spectrum_to_xyz + xyz_to_rgb (ops/spectrum.py:65-94) on planes.

    accum: [4,S,L] per-hero-wavelength radiance; returns RGB+alpha=1
    [4,S,L] (exposure applied by the caller)."""
    spd, sets = spec
    ns = spd.shape[0] - 3
    lam = st['lam']
    pdf0 = jnp.float32(1.0 / 470.0)
    tw = (st['flags'] & jnp.uint32(C.RAY_FLAG_WAVES_DIVERGED)) != 0
    xyz = []
    for k in range(3):
        acc = jnp.zeros_like(accum[0])
        for j in range(4):
            pdf = jnp.where(tw, pdf0 / 4.0 if j == 0 else 0.0, pdf0)
            specp = jnp.where(pdf != 0.0, accum[j] / jnp.where(pdf == 0.0, 1.0, pdf), 0.0)
            acc = acc + cie_fetch(spd, ns + k, lam[j]) * specp
        xyz.append(acc * (0.25 / 106.856895))
    m = ((3.240479, -1.537150, -0.498535),
         (-0.969256, 1.875991, 0.041556),
         (0.055648, -0.204043, 1.057311))
    rgb = [m[r][0] * xyz[0] + m[r][1] * xyz[1] + m[r][2] * xyz[2]
           for r in range(3)]
    return jnp.stack(rgb + [jnp.ones_like(rgb[0])])


# ===========================================================================
# bounce stages
# ===========================================================================

def stage_nee(pk_wx, pk_wy, pk_wz, shade_t, n_tris, light_lane, consts,
              md, tex_color, st, bounce, integrator_type: int,
              active=None, mtypes=None, spec=None):
    """kernel_SampleLightSource (integrator_pt.cpp:350-424).

    active: optional shade mask replacing the liveness test (regeneration
    mode excludes freshly re-inited lanes that have no hit yet).
    Returns (shade_color [4,S,L], rngx, rngy)."""
    shp = st['flags'].shape
    live = ~_is_dead(st['flags']) if active is None else active
    rngx, rngy, rnd_id = rnd_float1(st['rngx'], st['rngy'], live)
    rngx, rngy, r4 = rnd_float4(rngx, rngy, live)
    num_lights = consts[CN_NUM_LIGHTS]
    light_idf = jnp.minimum(jnp.floor(rnd_id * num_lights), num_lights - 1.0)
    lid = light_idf.astype(jnp.int32)
    ld = fetch_light(light_lane, lid)

    lpos, lnorm, is_omni = light_sample_rev(ld, r4[0], r4[1], st['hit_pos'])
    ddiff = st['hit_pos'] - lpos
    hit_dist = jnp.sqrt(dot3(ddiff, ddiff))
    shadow_dir = normalize3(lpos - st['hit_pos'])
    offs = jnp.maximum(maxcomp3(st['hit_pos']), 1.0) * 5e-6
    shadow_pos = st['hit_pos'] + st['hit_norm'] * offs

    in_illum = (dot3(shadow_dir, lnorm) < 0.0) | is_omni
    need_trace = live & in_illum
    occluded = _trace_blocks(pk_wx, pk_wy, pk_wz, shade_t, n_tris,
                             shadow_pos, shadow_dir,
                             jnp.zeros(shp, jnp.float32),
                             jnp.where(need_trace, hit_dist * 0.9995, 0.0),
                             any_hit=True)
    need_shade = need_trace & ~occluded

    bsdf_val, bsdf_pdf = mat_eval(md, tex_color, shadow_dir, -st['d'],
                                  st['hit_norm'], mtypes=mtypes,
                                  spec=spec, lam=st.get('lam'))
    cos_out = jnp.maximum(dot3(shadow_dir, st['hit_norm']), 0.0)
    lgt_pdf_w = (1.0 / jnp.maximum(num_lights, 1.0)) * light_eval_pdf(
        ld, shadow_pos, shadow_dir, lpos, lnorm)
    if integrator_type == INTEGRATOR_MIS_PT:
        mis = mis_weight(lgt_pdf_w, bsdf_pdf)
    else:
        mis = jnp.ones(shp, jnp.float32)
    is_point = ld['geom'] == LIGHT_GEOM_POINT
    mis = jnp.where(is_point, 1.0, mis)

    light_color = light_intensity(ld, spec, st.get('lam'))
    shade = (light_color * bsdf_val / jnp.maximum(lgt_pdf_w, 1e-30)
             * (cos_out * mis))
    shade = jnp.where(need_shade, shade, 0.0)
    return shade, rngx, rngy


def stage_next_bounce(md, tex_color, st, shade_color, bounce,
                      integrator_type: int, light_lane, consts,
                      active=None, prim=None, mtypes=None, spec=None):
    """kernel_NextBounce (integrator_pt.cpp:426-548).

    bounce: static int, or None in regeneration mode where `prim` (bool
    plane) marks lanes shading their camera hit (no emissive MIS)."""
    shp = st['flags'].shape
    live = ~_is_dead(st['flags']) if active is None else active
    is_light_mat = md['mtype'] == float(MTYPE_SMALL_LIGHT)

    # ---- light-hit branch (integrator_pt.cpp:461-506) --------------------
    lgt_id = st['hit_lgt'].astype(jnp.int32)
    has_light = lgt_id >= 0
    emiss = md['c0'] * tex_color          # EMISSION_COLOR slot = colors[0]
    ldh = fetch_light(light_lane, jnp.maximum(lgt_id, 0))
    light_cos = dot3(st['d'], ldh['norm'])
    atten = jnp.where((light_cos < 0.0) | (ldh['geom'] == LIGHT_GEOM_SPHERE),
                      1.0, 0.0)
    li_from_light = light_intensity(ldh, spec, st.get('lam')) * atten
    light_int = jnp.where(has_light, li_from_light, emiss)

    mis_weight_l = jnp.ones(shp, jnp.float32)
    if integrator_type == INTEGRATOR_MIS_PT and (bounce is None or bounce > 0):
        num_lights = consts[CN_NUM_LIGHTS]
        lgt_pdf = (1.0 / jnp.maximum(num_lights, 1.0)) * light_eval_pdf(
            ldh, st['o'], st['d'], st['hit_pos'], st['hit_norm'])
        w = mis_weight(st['mis_pdf'], lgt_pdf)
        w = jnp.where(st['mis_pdf'] <= 0.0, 1.0, w)
        if bounce is None:
            # regeneration mode: camera-ray hits take the light intensity
            # unweighted (the fixed chain's bounce==0 branch)
            w = jnp.where(prim, 1.0, w)
        mis_weight_l = jnp.where(has_light, w, 1.0)
    elif integrator_type == INTEGRATOR_SHADOW_PT:
        mis_weight_l = jnp.where(_has_non_spec(st['flags']), 0.0, 1.0)

    light_branch = live & is_light_mat
    accum_light = st['accum'] + st['thr'] * light_int * mis_weight_l
    flags_light = st['flags'] | jnp.uint32(C.RAY_FLAG_IS_DEAD | C.RAY_FLAG_HIT_LIGHT)

    # ---- surface branch ---------------------------------------------------
    surf_live = live & ~is_light_mat
    rngx, rngy, rands = rnd_float4(st['rngx'], st['rngy'], surf_live)
    samp = mat_sample(md, tex_color, rands, -st['d'], st['hit_norm'],
                      ray_flags=st['flags'], mis_ior=st['mis_ior'],
                      mtypes=mtypes, spec=spec, lam=st.get('lam'))

    bxdf = samp['val'] / jnp.maximum(samp['pdf'], 1e-20)
    cos_theta = jnp.abs(dot3(samp['dir'], st['hit_norm']))
    new_mis_pdf = jnp.where((samp['flags'] & jnp.uint32(C.RAY_EVENT_S)) != 0,
                            -1.0, samp['pdf'])
    if integrator_type == INTEGRATOR_STUPID_PT:
        new_thr = st['thr'] * cos_theta * bxdf
        new_accum = st['accum']
    else:
        new_accum = st['accum'] + st['thr'] * shade_color
        new_thr = st['thr'] * cos_theta * bxdf

    new_pos = offs_ray_pos(st['hit_pos'], st['hit_norm'], samp['dir'])
    next_flags = ((st['flags'] & ~jnp.uint32(C.RAY_FLAG_FIRST_NON_SPEC))
                  | samp['flags'])
    first_ns = ~_has_non_spec(st['flags']) & _has_non_spec(next_flags)
    next_flags = jnp.where(first_ns,
                           next_flags | jnp.uint32(C.RAY_FLAG_FIRST_NON_SPEC),
                           next_flags)

    lb = light_branch
    sb_ = surf_live
    st = dict(st)
    st['accum'] = jnp.where(lb, accum_light, jnp.where(sb_, new_accum, st['accum']))
    st['thr'] = jnp.where(sb_, new_thr, st['thr'])
    st['flags'] = jnp.where(lb, flags_light, jnp.where(sb_, next_flags, st['flags']))
    st['o'] = jnp.where(sb_, new_pos, st['o'])
    st['d'] = jnp.where(sb_, samp['dir'], st['d'])
    st['mis_pdf'] = jnp.where(sb_, new_mis_pdf, st['mis_pdf'])
    st['mis_ior'] = jnp.where(sb_, samp['ior'], st['mis_ior'])
    st['rngx'] = rngx
    st['rngy'] = rngy
    return st


def stage_env_contribute(consts, st, integrator_type: int, env_tex4=None,
                         spec=None):
    """kernel_HitEnvironment (flat env color, or color * lat-long map texel
    when env_tex4 [4,S,L] is supplied by the tap pipeline; env importance
    sampling / cam-back stay on the XLA path) + contribute.

    Spectral scenes (``spec``): miss radiance comes from the env SPD (or
    the flat color as wavelength lanes), and the per-hero-wavelength accum
    converts to RGB in-kernel (spectrum_to_xyz + xyz_to_rgb, matching
    render.py:87-92) — the XLA-side chunk accumulator then sums plain RGB.

    Returns contrib [4,S,L]."""
    out = (st['flags'] & jnp.uint32(C.RAY_FLAG_OUT_OF_SCENE)) != 0
    env_color = jnp.stack([jnp.full(st['flags'].shape, consts[CN_ENV_COLOR + i],
                                    jnp.float32) for i in range(4)])
    if spec is not None:
        spd, sets = spec
        env_sid, env_mult = sets[4], sets[5]
        if env_sid >= 0:
            sid = jnp.full(st['flags'].shape, env_sid, jnp.int32)
            env_color = jnp.stack([
                spd_sample(spd, (env_sid,), sid, st['lam'][j])
                for j in range(4)]) * jnp.float32(env_mult / 106.856895)
    if env_tex4 is not None:
        env_color = env_color * env_tex4
    if integrator_type == INTEGRATOR_STUPID_PT:
        new_accum = st['thr'] * env_color
    else:
        new_accum = st['accum'] + st['thr'] * env_color
    accum = jnp.where(out, new_accum, st['accum'])
    if spec is not None:
        c = spectral_contrib(spec, st, accum)
        return jnp.concatenate(
            [c[:3] * consts[CN_EXPOSURE], c[3:4]], axis=0)
    resp = jnp.stack([jnp.full(st['flags'].shape, consts[CN_CAM_RESP + i],
                               jnp.float32) for i in range(4)])
    return accum * resp * consts[CN_EXPOSURE]


def _mat_id(flags):
    return (flags & jnp.uint32(0x00FFFFFF)).astype(jnp.int32)


def _tap_xla_like(pk: MegaPack, qidx):
    """Reference-path tap: same gather + transpose as _tap_xla but for an
    arbitrary plane shape; returns [16, sb, 128]."""
    sb, l = qidx.shape
    rows = pk.quad_rows[qidx.reshape(-1)]
    return rows[:, :16].reshape(sb, l, 16).transpose(2, 0, 1)


def sample_pass_ref(pk: MegaPack, xs, ys, rngx, rngy, depth: int,
                    integrator_type: int):
    """One full sample per ray, stages chained under plain XLA (the
    correctness oracle for the Pallas pipeline; also exercises the exact
    same stage functions).  Returns (contrib [4,...], rngx, rngy)."""
    spec = (pk.spd_lane, pk.spd_sets) if pk.spectral else None
    st = stage_init(pk.consts, xs, ys, rngx, rngy, spectral=pk.spectral)
    n_bounce = depth + (1 if integrator_type == INTEGRATOR_STUPID_PT else 0)
    for b in range(n_bounce):
        st = stage_trace(pk.wx, pk.wy, pk.wz, pk.shade_t, pk.n_tris, st, b)
        md = fetch_mat(pk.mat_lane, _mat_id(st['flags']))
        if pk.tex_const:
            tex = md['texc']
        else:
            qidx, w4 = stage_tap_prep(pk.tex_lane, md, st)
            qT = _tap_xla_like(pk, qidx)
            tex = tex_from_rows(qT, w4)
        if integrator_type != INTEGRATOR_STUPID_PT:
            shade, rngx2, rngy2 = stage_nee(
                pk.wx, pk.wy, pk.wz, pk.shade_t, pk.n_tris, pk.light_lane,
                pk.consts, md, tex, st, b, integrator_type,
                mtypes=pk.mtypes, spec=spec)
            st['rngx'] = rngx2
            st['rngy'] = rngy2
        else:
            shade = jnp.zeros_like(st['accum'])
        st = stage_next_bounce(md, tex, st, shade, b, integrator_type,
                               pk.light_lane, pk.consts, mtypes=pk.mtypes,
                               spec=spec)
    env4 = None
    if pk.env_mapped:
        qe, we = stage_env_tap_prep(pk.consts, pk.tex_lane, st['d'])
        qT = _tap_xla_like(pk, qe.reshape(-1, qe.shape[-1]))
        env4 = tex_from_rows(qT.reshape((16,) + st['flags'].shape), we)
    contrib = stage_env_contribute(pk.consts, st, integrator_type, env4,
                                   spec=spec)
    return contrib, st['rngx'], st['rngy']


# ===========================================================================
# Pallas pipeline
# ===========================================================================

# f32 state tensor rows
SF_O = 0          # 3
SF_D = 3          # 3
SF_ACCUM = 6      # 4
SF_THR = 10       # 4
SF_MISPDF = 14
SF_MISIOR = 15
SF_HITPOS = 16    # 3
SF_HITNORM = 19   # 3
SF_HITUV = 22     # 2
SF_HITDIST = 24
SF_HITLGT = 25
SF_NROWS = 26
SF_LAM = 26       # +4 hero-wavelength rows, SPECTRAL scenes only


def _sf_nrows(spectral):
    return SF_NROWS + (4 if spectral else 0)
# u32 state tensor rows
SU_RNGX = 0
SU_RNGY = 1
SU_FLAGS = 2
SU_NROWS = 3


def _unpack_state(sf, su, spectral=False):
    st = dict(
        o=sf[SF_O:SF_O + 3], d=sf[SF_D:SF_D + 3],
        accum=sf[SF_ACCUM:SF_ACCUM + 4], thr=sf[SF_THR:SF_THR + 4],
        mis_pdf=sf[SF_MISPDF], mis_ior=sf[SF_MISIOR],
        hit_pos=sf[SF_HITPOS:SF_HITPOS + 3],
        hit_norm=sf[SF_HITNORM:SF_HITNORM + 3],
        hit_uv=sf[SF_HITUV:SF_HITUV + 2],
        hit_dist=sf[SF_HITDIST], hit_lgt=sf[SF_HITLGT],
        rngx=su[SU_RNGX], rngy=su[SU_RNGY], flags=su[SU_FLAGS])
    if spectral:
        st['lam'] = sf[SF_LAM:SF_LAM + 4]
    return st


def _pack_state(st):
    rows = [st['o'], st['d'], st['accum'], st['thr'],
            st['mis_pdf'][None], st['mis_ior'][None],
            st['hit_pos'], st['hit_norm'], st['hit_uv'],
            st['hit_dist'][None], st['hit_lgt'][None]]
    if 'lam' in st:
        rows.append(st['lam'])
    sf = jnp.concatenate(rows, axis=0)
    su = jnp.stack([st['rngx'], st['rngy'], st['flags']])
    return sf, su


# regeneration-mode state extension: a per-lane accumulator of COMPLETED
# samples + completed-sample count + per-sample bounce counter.  When a path
# dies (light hit / out of scene / depth truncation) the lane flushes the
# sample into the accumulator and immediately re-inits the NEXT sample of
# the same pixel — lane-iterations per sample drop from `depth` to the
# expected path length (the reference has no equivalent: its megakernel
# runs dead threads to the loop end, integrator_pt.cpp:719-758).
# (spectral scenes carry 4 extra lam rows, so the accumulator offset is
# _sf_nrows(spectral); RF_ACC/RF_NROWS are the non-spectral values)
RF_ACC = SF_NROWS      # 4 rows f32: sum of completed-sample contributions
RF_NROWS = SF_NROWS + 4
RU_NDONE = SU_NROWS        # completed-sample count
RU_BCNT = SU_NROWS + 1     # bounces shaded for the in-flight sample
RU_NROWS = SU_NROWS + 2


def _merge_state(cond, a, b):
    """Lane-wise state select: cond ? a : b.  RNG comes from `a`
    unconditionally (masked draws already leave unmasked lanes intact)."""
    out = {}
    for k in b:
        out[k] = a[k] if k in ('rngx', 'rngy') else jnp.where(cond, a[k], b[k])
    return out


@functools.lru_cache(maxsize=64)
def _build_kernels(depth: int, integrator_type: int, textured: bool,
                   n_blocks: int, n_tris: int, n_quad_rows: int,
                   interpret: bool, env_tap: bool = False, mtypes=None,
                   spectral: bool = False, spd_sets=None):
    """Compile-time assembly of the per-bounce kernel chain.

    Chain: K0 = init+trace(0); K_b = shade(b-1)+trace(b); K_last =
    shade(depth-1)+env+contribute.  Texture taps (XLA row gathers from the
    sliding-window quad pool) run between kernels."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = n_blocks
    n_bounce = depth + (1 if integrator_type == INTEGRATOR_STUPID_PT else 0)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def bspec(k):
        # block-major state [NB, k, S, L]: ONE contiguous DMA per grid step
        # (the [k, NB*S, L] layout DMA'd k strided 4KB slabs per step and
        # dominated the per-block time at large grids)
        return pl.BlockSpec((1, k, S, L), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def rspec(c, dt=None):   # [NB*RBLK, c] ray-major rows blocked by grid
        return pl.BlockSpec((RBLK, c), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def make_kernel(shade_bounce, trace_bounce, first, last):
        """Returns (fn, in_specs, out_specs, out_shapes builder)."""
        emit_tap = (textured or env_tap) and trace_bounce is not None
        take_tap = (textured or env_tap) and shade_bounce is not None

        def kernel(*refs):
            i = 0
            consts = refs[i]; i += 1   # SMEM ref: scalar loads only
            wx = refs[i][:]; i += 1
            wy = refs[i][:]; i += 1
            wz = refs[i][:]; i += 1
            shade_t = refs[i][:]; i += 1
            mat_lane = refs[i][:]; i += 1
            spd = None
            if spectral:
                spd = refs[i][:]; i += 1
            spec = (spd, spd_sets) if spectral else None
            tex_lane = refs[i][:] if (emit_tap or take_tap) else None
            if emit_tap or take_tap:
                i += 1
            light_lane = refs[i][:] if shade_bounce is not None else None
            if shade_bounce is not None:
                i += 1
            if first:
                xy = refs[i][0]; i += 1
                su = refs[i][0]; i += 1
                st = stage_init(consts, xy[0], xy[1], su[SU_RNGX],
                                su[SU_RNGY], spectral=spectral)
            else:
                sf = refs[i][0]; i += 1
                su = refs[i][0]; i += 1
                st = _unpack_state(sf, su, spectral)
            if take_tap:
                q16 = refs[i][0]; i += 1
            n_in = i
            out = list(refs[n_in:])

            if shade_bounce is not None:
                md = fetch_mat(mat_lane, _mat_id(st['flags']))
                if textured:
                    # recompute the corner weights from state — cheaper
                    # than shipping [N,16] weights across the boundary
                    _, w4 = stage_tap_prep(tex_lane, md, st)
                    tex = tex_from_rows(q16, w4)
                else:
                    tex = md['texc']
                if integrator_type != INTEGRATOR_STUPID_PT:
                    shade, rngx2, rngy2 = stage_nee(
                        wx, wy, wz, shade_t, n_tris, light_lane, consts,
                        md, tex, st, shade_bounce, integrator_type,
                        mtypes=mtypes, spec=spec)
                    st['rngx'] = rngx2
                    st['rngy'] = rngy2
                else:
                    shade = jnp.zeros_like(st['accum'])
                st = stage_next_bounce(md, tex, st, shade, shade_bounce,
                                       integrator_type, light_lane, consts,
                                       mtypes=mtypes, spec=spec)

            if last:
                env4 = None
                if env_tap:
                    # miss lanes' q16 rows hold env texels (the trace
                    # kernels emit env taps for OUT lanes); recompute the
                    # env corner weights from the preserved direction
                    _, we = stage_env_tap_prep(consts, tex_lane, st['d'])
                    env4 = tex_from_rows(q16, we)
                contrib = stage_env_contribute(consts, st, integrator_type,
                                               env4, spec=spec)
                out[0][0] = contrib
                out[1][0] = jnp.stack([st['rngx'], st['rngy'], st['flags']])
                return

            st = stage_trace(wx, wy, wz, shade_t, n_tris, st, trace_bounce)
            sf2, su2 = _pack_state(st)
            out[0][0] = sf2
            out[1][0] = su2
            if emit_tap:
                # clamp into the pool (the XLA gather must never read OOB);
                # dead non-env lanes all read row 0 — random-row DMA
                # bandwidth is the tap's cost, one hot row is free
                live = ~_is_dead(st['flags'])
                if textured:
                    md2 = fetch_mat(mat_lane, _mat_id(st['flags']))
                    qidx, _ = stage_tap_prep(tex_lane, md2, st)
                    q = jnp.where(live, jnp.clip(qidx, 0, n_quad_rows - 1), 0)
                else:
                    q = jnp.zeros(st['flags'].shape, jnp.int32)
                if env_tap:
                    # OUT lanes re-emit their env tap every bounce so the
                    # last kernel still sees it (later emits would
                    # otherwise overwrite early deaths with row 0)
                    out_l = (st['flags']
                             & jnp.uint32(C.RAY_FLAG_OUT_OF_SCENE)) != 0
                    qe, _ = stage_env_tap_prep(consts, tex_lane, st['d'])
                    q = jnp.where(out_l,
                                  jnp.clip(qe, 0, n_quad_rows - 1), q)
                out[2][0, 0] = q

        in_specs = [smem, full, full, full, full, full]
        if spectral:
            in_specs.append(full)
        if emit_tap or take_tap:
            in_specs.append(full)
        if shade_bounce is not None:
            in_specs.append(full)
        SFN = _sf_nrows(spectral)
        if first:
            in_specs += [bspec(2), bspec(SU_NROWS)]
        else:
            in_specs += [bspec(SFN), bspec(SU_NROWS)]
        if take_tap:
            in_specs += [bspec(16)]

        def out_for(n_rays):
            nb = n_rays // RBLK
            if last:
                shapes = (jax.ShapeDtypeStruct((nb, 4, S, L), jnp.float32),
                          jax.ShapeDtypeStruct((nb, SU_NROWS, S, L), jnp.uint32))
                specs = (bspec(4), bspec(SU_NROWS))
            else:
                shapes = [jax.ShapeDtypeStruct((nb, SFN, S, L), jnp.float32),
                          jax.ShapeDtypeStruct((nb, SU_NROWS, S, L), jnp.uint32)]
                specs = [bspec(SFN), bspec(SU_NROWS)]
                if emit_tap:
                    shapes += [jax.ShapeDtypeStruct((nb, 1, S, L), jnp.int32)]
                    specs += [bspec(1)]
                shapes, specs = tuple(shapes), tuple(specs)
            return shapes, specs

        return kernel, in_specs, out_for

    def call(kspec, pk_args, state_args, n_rays):
        kernel, in_specs, out_for = kspec
        out_shapes, out_specs = out_for(n_rays)
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*pk_args, *state_args)

    ks = {}
    if not textured and not env_tap:
        # const-texture scenes need no between-kernel taps: the ENTIRE
        # sample (camera -> depth bounces -> env -> contribute) is ONE
        # kernel — no per-bounce state round-trips through HBM
        def whole_kernel(*refs):
            i = 0
            consts = refs[i]; i += 1
            wx = refs[i][:]; i += 1
            wy = refs[i][:]; i += 1
            wz = refs[i][:]; i += 1
            shade_t = refs[i][:]; i += 1
            mat_lane = refs[i][:]; i += 1
            spd = None
            if spectral:
                spd = refs[i][:]; i += 1
            spec = (spd, spd_sets) if spectral else None
            light_lane = refs[i][:]; i += 1
            xy = refs[i][0]; i += 1
            su = refs[i][0]; i += 1
            ocontrib, osu = refs[i], refs[i + 1]
            st = stage_init(consts, xy[0], xy[1], su[SU_RNGX], su[SU_RNGY],
                            spectral=spectral)
            for b in range(n_bounce):
                st = stage_trace(wx, wy, wz, shade_t, n_tris, st, b)
                md = fetch_mat(mat_lane, _mat_id(st['flags']))
                tex = md['texc']
                if integrator_type != INTEGRATOR_STUPID_PT:
                    shade, rngx2, rngy2 = stage_nee(
                        wx, wy, wz, shade_t, n_tris, light_lane, consts,
                        md, tex, st, b, integrator_type, mtypes=mtypes,
                        spec=spec)
                    st['rngx'] = rngx2
                    st['rngy'] = rngy2
                else:
                    shade = jnp.zeros_like(st['accum'])
                st = stage_next_bounce(md, tex, st, shade, b,
                                       integrator_type, light_lane, consts,
                                       mtypes=mtypes, spec=spec)
            contrib = stage_env_contribute(consts, st, integrator_type,
                                           spec=spec)
            ocontrib[0] = contrib
            osu[0] = jnp.stack([st['rngx'], st['rngy'], st['flags']])

        whole_specs = ([smem, full, full, full, full, full]
                       + ([full] if spectral else []) + [full]
                       + [bspec(2), bspec(SU_NROWS)])

        def whole_out(n_rays):
            nb = n_rays // RBLK
            return ((jax.ShapeDtypeStruct((nb, 4, S, L), jnp.float32),
                     jax.ShapeDtypeStruct((nb, SU_NROWS, S, L), jnp.uint32)),
                    (bspec(4), bspec(SU_NROWS)))

        ks['whole'] = (whole_kernel, whole_specs, whole_out)
    ks['first'] = make_kernel(None, 0, True, False)
    for b in range(1, n_bounce):
        ks[('mid', b)] = make_kernel(b - 1, b, False, False)
    ks['last'] = make_kernel(n_bounce - 1, None, False, True)
    return ks, call


def _build_regen_kernels(depth: int, integrator_type: int, textured: bool,
                         n_blocks: int, n_tris: int, n_quad_rows: int,
                         interpret: bool, env_tap: bool = False,
                         mtypes=None, spectral: bool = False,
                         spd_sets=None):
    """Regeneration-mode kernels (persistent samples, VERDICT item: deep-
    bounce occupancy).  Two kernels:

    * rfirst: init every lane's first sample + trace + tap emit.
    * rmid (iterated): flush entry-dead lanes (trace misses) into the lane
      accumulator and re-init them; shade everyone else (NEE + next bounce);
      flush shade-deaths (light hits, depth truncation) and re-init those;
      trace all lanes; emit the next tap.

    Every lane is live at every trace — dead-lane waste (1.6x at depth 5 on
    the Cornell occupancy profile, docs/PERF_NOTES.md) disappears, at the
    price of a per-pixel variable sample count (normalized at finalize)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NB = n_blocks
    n_bounce = depth + (1 if integrator_type == INTEGRATOR_STUPID_PT else 0)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def bspec(k):
        return pl.BlockSpec((1, k, S, L), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    SFN = _sf_nrows(spectral)

    def unpack_r(sf, su):
        st = _unpack_state(sf, su, spectral)
        return st, sf[SFN:SFN + 4], su[RU_NDONE], su[RU_BCNT]

    def pack_r(st, lane_acc, ndone, bcnt):
        sf, su = _pack_state(st)
        return (jnp.concatenate([sf, lane_acc], axis=0),
                jnp.concatenate([su, ndone[None], bcnt[None]], axis=0))

    tap = textured or env_tap

    def emit_tap(out, slot, consts, tex_lane, mat_lane, st):
        live = ~_is_dead(st['flags'])
        if textured:
            md2 = fetch_mat(mat_lane, _mat_id(st['flags']))
            qidx, _ = stage_tap_prep(tex_lane, md2, st)
            q = jnp.where(live, jnp.clip(qidx, 0, n_quad_rows - 1), 0)
        else:
            q = jnp.zeros(st['flags'].shape, jnp.int32)
        if env_tap:
            out_l = (st['flags'] & jnp.uint32(C.RAY_FLAG_OUT_OF_SCENE)) != 0
            qe, _ = stage_env_tap_prep(consts, tex_lane, st['d'])
            q = jnp.where(out_l, jnp.clip(qe, 0, n_quad_rows - 1), q)
        out[slot][0, 0] = q

    def make_rfirst():
        def kernel(*refs):
            i = 0
            consts = refs[i]; i += 1
            wx = refs[i][:]; i += 1
            wy = refs[i][:]; i += 1
            wz = refs[i][:]; i += 1
            shade_t = refs[i][:]; i += 1
            mat_lane = refs[i][:]; i += 1
            if spectral:
                i += 1                      # spd table: unused by rfirst
            tex_lane = refs[i][:] if tap else None
            if tap:
                i += 1
            xy = refs[i][0]; i += 1
            su = refs[i][0]; i += 1
            out = list(refs[i:])
            st = stage_init(consts, xy[0], xy[1], su[SU_RNGX], su[SU_RNGY],
                            spectral=spectral)
            st = stage_trace(wx, wy, wz, shade_t, n_tris, st, 0)
            zero_u = jnp.zeros(st['flags'].shape, jnp.uint32)
            sf2, su2 = pack_r(st, jnp.zeros_like(st['accum']), zero_u, zero_u)
            out[0][0] = sf2
            out[1][0] = su2
            if tap:
                emit_tap(out, 2, consts, tex_lane, mat_lane, st)

        in_specs = [smem, full, full, full, full, full]
        if spectral:
            in_specs.append(full)
        if tap:
            in_specs.append(full)
        in_specs += [bspec(2), bspec(SU_NROWS)]
        return kernel, in_specs

    def make_rmid():
        def kernel(*refs):
            i = 0
            consts = refs[i]; i += 1
            wx = refs[i][:]; i += 1
            wy = refs[i][:]; i += 1
            wz = refs[i][:]; i += 1
            shade_t = refs[i][:]; i += 1
            mat_lane = refs[i][:]; i += 1
            spd = None
            if spectral:
                spd = refs[i][:]; i += 1
            spec = (spd, spd_sets) if spectral else None
            tex_lane = refs[i][:] if tap else None
            if tap:
                i += 1
            light_lane = refs[i][:]; i += 1
            xy = refs[i][0]; i += 1
            sf = refs[i][0]; i += 1
            su = refs[i][0]; i += 1
            q16 = refs[i][0] if tap else None
            if tap:
                i += 1
            out = list(refs[i:])

            st, lane_acc, ndone, bcnt = unpack_r(sf, su)

            # 1. flush lanes that died at the previous trace (miss -> env)
            dead0 = _is_dead(st['flags'])
            env4 = None
            if env_tap:
                _, we = stage_env_tap_prep(consts, tex_lane, st['d'])
                env4 = tex_from_rows(q16, we)
            contrib0 = stage_env_contribute(consts, st, integrator_type,
                                            env4, spec=spec)
            lane_acc = lane_acc + jnp.where(dead0, contrib0, 0.0)
            ndone = ndone + dead0.astype(jnp.uint32)
            stf = stage_init(consts, xy[0], xy[1], st['rngx'], st['rngy'],
                             mask=dead0, spectral=spectral)
            st = _merge_state(dead0, stf, st)
            bcnt = jnp.where(dead0, jnp.uint32(0), bcnt)
            act = ~dead0          # non-fresh lanes all carry a valid hit

            # 2. shade
            md = fetch_mat(mat_lane, _mat_id(st['flags']))
            if textured:
                _, w4 = stage_tap_prep(tex_lane, md, st)
                tex = tex_from_rows(q16, w4)
            else:
                tex = md['texc']
            prim = bcnt == 0
            if integrator_type != INTEGRATOR_STUPID_PT:
                shade, rngx2, rngy2 = stage_nee(
                    wx, wy, wz, shade_t, n_tris, light_lane, consts,
                    md, tex, st, None, integrator_type, active=act,
                    mtypes=mtypes, spec=spec)
                st['rngx'] = rngx2
                st['rngy'] = rngy2
            else:
                shade = jnp.zeros_like(st['accum'])
            st = stage_next_bounce(md, tex, st, shade, None, integrator_type,
                                   light_lane, consts, active=act, prim=prim,
                                   mtypes=mtypes, spec=spec)
            bcnt = bcnt + act.astype(jnp.uint32)
            # depth truncation: the fixed chain discards the sampled bounce
            # ray after shade n_bounce-1; kill those paths here
            trunc = act & (bcnt >= jnp.uint32(n_bounce)) \
                & ~_is_dead(st['flags'])
            st['flags'] = jnp.where(
                trunc, st['flags'] | jnp.uint32(C.RAY_FLAG_IS_DEAD),
                st['flags'])

            # 3. flush shade-deaths (light hit / truncation) + re-init
            dead1 = _is_dead(st['flags']) & act
            contrib1 = stage_env_contribute(consts, st, integrator_type,
                                            spec=spec)
            lane_acc = lane_acc + jnp.where(dead1, contrib1, 0.0)
            ndone = ndone + dead1.astype(jnp.uint32)
            stf2 = stage_init(consts, xy[0], xy[1], st['rngx'], st['rngy'],
                              mask=dead1, spectral=spectral)
            st = _merge_state(dead1, stf2, st)
            bcnt = jnp.where(dead1, jnp.uint32(0), bcnt)

            # 4. trace (every lane is live: continuing or freshly inited)
            st = stage_trace(wx, wy, wz, shade_t, n_tris, st, None,
                             prim=bcnt == 0)

            sf2, su2 = pack_r(st, lane_acc, ndone, bcnt)
            out[0][0] = sf2
            out[1][0] = su2
            if tap:
                emit_tap(out, 2, consts, tex_lane, mat_lane, st)

        in_specs = [smem, full, full, full, full, full]
        if spectral:
            in_specs.append(full)
        if tap:
            in_specs.append(full)
        in_specs.append(full)  # light_lane
        in_specs += [bspec(2), bspec(SFN + 4), bspec(RU_NROWS)]
        if tap:
            in_specs += [bspec(16)]
        return kernel, in_specs

    def out_for(n_rays):
        nb = n_rays // RBLK
        shapes = [jax.ShapeDtypeStruct((nb, SFN + 4, S, L), jnp.float32),
                  jax.ShapeDtypeStruct((nb, RU_NROWS, S, L), jnp.uint32)]
        specs = [bspec(SFN + 4), bspec(RU_NROWS)]
        if tap:
            shapes += [jax.ShapeDtypeStruct((nb, 1, S, L), jnp.int32)]
            specs += [bspec(1)]
        return tuple(shapes), tuple(specs)

    def call(kspec, pk_args, state_args, n_rays):
        kernel, in_specs = kspec
        out_shapes, out_specs = out_for(n_rays)
        return pl.pallas_call(
            kernel,
            grid=(NB,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            interpret=interpret,
        )(*pk_args, *state_args)

    return {'rfirst': make_rfirst(), 'rmid': make_rmid()}, call


def _tap_xla(pk: MegaPack, qidx):
    """Between-kernel texture tap: ONE DMA row gather from the sliding
    quad pool + the ray-major -> plane transpose (cheap in XLA, ruinous
    in-kernel).  Returns [NB, 16, S, L] bf16 quad planes."""
    n = qidx.size
    nb = n // RBLK
    rows = pk.quad_rows[qidx.reshape(-1)]                      # [N,128] bf16
    q16 = rows[:, :16]
    return q16.reshape(nb, S, L, 16).transpose(0, 3, 1, 2)    # [NB,16,S,L]


def sample_pass_pallas(pk: MegaPack, xy, sf_unused, su, depth: int,
                       integrator_type: int, interpret: bool = False):
    """One sample per ray through the Pallas kernel chain.

    xy: [NB, 2, S, L] f32 pixel coords; su: [NB, 3, S, L] u32 (rng + flags
    slot) — block-major (see bspec).  Returns (contrib [NB, 4, S, L],
    su')."""
    n_rays = xy.shape[0] * RBLK
    NB = n_rays // RBLK
    nq = 1 if pk.quad_rows is None else int(pk.quad_rows.shape[0])
    ks, call = _build_kernels(depth, integrator_type, not pk.tex_const,
                              NB, pk.n_tris, nq, interpret,
                              env_tap=pk.env_mapped, mtypes=pk.mtypes,
                              spectral=pk.spectral, spd_sets=pk.spd_sets)
    base = [pk.consts, pk.wx, pk.wy, pk.wz, pk.shade_t, pk.mat_lane]
    if pk.spectral:
        base.append(pk.spd_lane)
    n_bounce = depth + (1 if integrator_type == INTEGRATOR_STUPID_PT else 0)
    textured = not pk.tex_const

    if not textured and not pk.env_mapped:
        contrib, su = call(ks['whole'],
                           base + [pk.light_lane], [xy, su], n_rays)
        return contrib, su

    pk_args = base + [pk.tex_lane]
    r = call(ks['first'], pk_args, [xy, su], n_rays)
    sf, su, qidx = r
    rows = _tap_xla(pk, qidx)

    for b in range(1, n_bounce):
        pk_args = base + [pk.tex_lane, pk.light_lane]
        r = call(ks[('mid', b)], pk_args, [sf, su, rows], n_rays)
        sf, su, qidx = r
        rows = _tap_xla(pk, qidx)

    pk_args = base + [pk.tex_lane, pk.light_lane]
    contrib, su = call(ks['last'], pk_args, [sf, su, rows], n_rays)
    return contrib, su


def _regen_iters(pk, ks, call, xy, sf, su, rows, k, n_rays):
    """k rmid iterations with taps between (traced inline under jit)."""
    tap = not pk.tex_const or pk.env_mapped
    base = [pk.consts, pk.wx, pk.wy, pk.wz, pk.shade_t, pk.mat_lane]
    if pk.spectral:
        base.append(pk.spd_lane)
    pk_mid = base + ([pk.tex_lane] if tap else []) + [pk.light_lane]
    for _ in range(k):
        state = [xy, sf, su] + ([rows] if tap else [])
        r = call(ks['rmid'], pk_mid, state, n_rays)
        if tap:
            sf, su, qidx = r
            rows = _tap_xla(pk, qidx)
        else:
            sf, su = r
    return sf, su, rows


@functools.partial(jax.jit, static_argnames=('depth', 'integrator_type',
                                             'k_iters', 'interpret'))
def _regen_start(pk, xy, su, depth, integrator_type, k_iters, interpret):
    """rfirst + (k_iters-1) rmid iterations; returns (sf, su, rows)."""
    n_rays = xy.shape[0] * RBLK
    nq = 1 if pk.quad_rows is None else int(pk.quad_rows.shape[0])
    tap = not pk.tex_const or pk.env_mapped
    ks, call = _build_regen_kernels(depth, integrator_type, not pk.tex_const,
                                    n_rays // RBLK, pk.n_tris, nq, interpret,
                                    env_tap=pk.env_mapped, mtypes=pk.mtypes,
                                    spectral=pk.spectral,
                                    spd_sets=pk.spd_sets)
    base = [pk.consts, pk.wx, pk.wy, pk.wz, pk.shade_t, pk.mat_lane]
    if pk.spectral:
        base.append(pk.spd_lane)
    pk_first = base + ([pk.tex_lane] if tap else [])
    r = call(ks['rfirst'], pk_first, [xy, su], n_rays)
    if tap:
        sf, su2, qidx = r
        rows = _tap_xla(pk, qidx)
    else:
        (sf, su2), rows = r, None
    return _regen_iters(pk, ks, call, xy, sf, su2, rows, k_iters - 1, n_rays)


@functools.partial(jax.jit, static_argnames=('depth', 'integrator_type',
                                             'k_iters', 'interpret'))
def _regen_cont(pk, xy, sf, su, rows, depth, integrator_type, k_iters,
                interpret):
    n_rays = xy.shape[0] * RBLK
    nq = 1 if pk.quad_rows is None else int(pk.quad_rows.shape[0])
    ks, call = _build_regen_kernels(depth, integrator_type, not pk.tex_const,
                                    n_rays // RBLK, pk.n_tris, nq, interpret,
                                    env_tap=pk.env_mapped, mtypes=pk.mtypes,
                                    spectral=pk.spectral,
                                    spd_sets=pk.spd_sets)
    return _regen_iters(pk, ks, call, xy, sf, su, rows, k_iters, n_rays)


@functools.partial(jax.jit, static_argnames=('integrator_type',))
def _regen_finalize(pk, sf, su, integrator_type):
    """Flush still-dead lanes (the in-flight partial sample is discarded —
    the stop rule is value-independent) and normalize per lane.

    Returns (img [4, n_rays], n_done [n_rays])."""
    sft = sf.transpose(1, 0, 2, 3)
    sut = su.transpose(1, 0, 2, 3)
    st = _unpack_state(sft, sut, pk.spectral)
    rf_acc = _sf_nrows(pk.spectral)
    lane_acc = sft[rf_acc:rf_acc + 4]
    ndone = sut[RU_NDONE]
    dead = _is_dead(st['flags'])
    env4 = None
    if pk.env_mapped:
        # XLA-side env tap for the final flush (the plane stage fns are
        # shape-generic: planes here are [NB, S, L])
        qe, we = stage_env_tap_prep(pk.consts, pk.tex_lane, st['d'])
        qT = _tap_xla_like(pk, qe.reshape(-1, L))
        env4 = tex_from_rows(qT.reshape((16,) + st['flags'].shape), we)
    fspec = (pk.spd_lane, pk.spd_sets) if pk.spectral else None
    contrib = stage_env_contribute(pk.consts, st, integrator_type, env4,
                                   spec=fspec)
    lane_acc = lane_acc + jnp.where(dead, contrib, 0.0)
    ndone = ndone + dead.astype(jnp.uint32)
    img = lane_acc / jnp.maximum(ndone.astype(jnp.float32), 1.0)
    # [4, NB, S, L] -> flat lane order nb*RBLK + s*L + l (matches setup)
    return img.reshape(4, -1), ndone.reshape(-1)


@jax.jit
def _regen_done_mean(su):
    return jnp.mean(su[:, RU_NDONE].astype(jnp.float32))


# ===========================================================================
# render driver
# ===========================================================================

_PACK_CACHE: dict = {}
_SETUP_CACHE: dict = {}


def get_pack(scene: Scene, meta: SceneMeta) -> MegaPack:
    """Per-scene pack cache (holds a strong scene ref so ids stay valid)."""
    key = id(scene)
    hit = _PACK_CACHE.get(key)
    if hit is not None and hit[0] is scene and hit[1] == meta:
        return hit[2]
    pk = pack(scene, meta)
    if len(_PACK_CACHE) > 8:
        _PACK_CACHE.clear()
    _PACK_CACHE[key] = (scene, meta, pk)
    return pk


@functools.partial(jax.jit, static_argnames=('depth', 'integrator_type',
                                             'k_samples', 'interpret'))
def _render_chunk(pk: MegaPack, xy, su, depth: int, integrator_type: int,
                  k_samples: int, interpret: bool):
    """k_samples unrolled sample passes (NOT lax.fori: while-loop carries
    defeat pallas buffer aliasing — gathers and kernels ran 2-4x slower
    under fori in the v5e profile)."""
    fb = jnp.zeros(xy.shape[:1] + (4, S, L), jnp.float32)
    for _ in range(k_samples):
        c, su = sample_pass_pallas(pk, xy, None, su, depth, integrator_type,
                                   interpret)
        # scrub non-finite lanes: the k=16-unrolled Mosaic chain emits a
        # DETERMINISTIC NaN on ~1e-5 of lanes (test_035 320x240 px(64,56))
        # that the XLA twin of the exact same stage math never produces
        # (validated: 16 chained sample_pass_ref passes, 0 NaNs on TPU) —
        # a compile-level anomaly, so dropping the broken lane's sample is
        # strictly more faithful than accumulating the NaN
        c = jnp.where(jnp.isfinite(c), c, 0.0)
        fb = fb + c
    return fb, su


def render(scene: Scene, meta: SceneMeta, spp: int = None,
           integrator: str = 'mispt', channels: int = 4,
           tile_size: int = 1 << 17, k_samples: int = 16,
           progress: bool = False, return_timing: bool = False,
           regen: bool = False):
    """Full-frame render through the Pallas megakernel pipeline.

    Mirrors render.render()'s contract ([H,W,channels] float32, normalized);
    RNG seeding matches the XLA path (same gen_init streams), so images
    agree with it up to FP-boundary path divergence.

    regen=True switches to the persistent-samples pipeline: each lane
    renders its pixel's samples back to back, re-initializing the moment a
    path dies, and the frame is normalized by the per-pixel completed-sample
    count (targeting a MEAN of `spp`).  Same estimator, same RNG streams —
    but the per-pixel sample count varies, so images differ from the fixed
    chain by reordering, not by distribution."""
    import time as _time
    from ..ops import rng as RNG

    assert channels == 4
    itype = {'naivept': INTEGRATOR_STUPID_PT, 'shadowpt': INTEGRATOR_SHADOW_PT,
             'mispt': INTEGRATOR_MIS_PT}[integrator]
    spp = spp or meta.spp
    W, H = meta.width, meta.height
    N = W * H
    interpret = jax.default_backend() != 'tpu'
    pk = get_pack(scene, meta)

    tile = max(RBLK, min(max(tile_size, 1 << 20), 1 << 20))
    Np = -(-N // RBLK) * RBLK
    tile = min(tile, Np)
    n_tiles = -(-Np // tile)
    k = max(1, min(k_samples, spp))

    t0 = _time.time()
    # ONE cached setup per (frame size, tiling): pixel coords and the
    # per-pixel RNG seeds are pure functions of the pixel grid (repeated
    # gen_init dispatches + host transposes were ~15% of bench wall time)
    key = (W, H, tile, n_tiles)
    hit = _SETUP_CACHE.get(key)
    if hit is None:
        ids = np.minimum(np.arange(n_tiles * tile, dtype=np.int64), N - 1)
        ids = ids.astype(np.int32)
        xy_all = np.stack([(ids % W).astype(np.float32),
                           (ids // W).astype(np.float32)])
        rng0 = np.asarray(RNG.gen_init(jnp.asarray(ids)))
        su_all = np.zeros((3, n_tiles * tile), np.uint32)
        su_all[0] = rng0[:, 0]
        su_all[1] = rng0[:, 1]
        NBt = tile // RBLK
        xy_t = tuple(jnp.asarray(
            xy_all[:, t * tile:(t + 1) * tile]
            .reshape(2, NBt, S, L).transpose(1, 0, 2, 3))
            for t in range(n_tiles))
        su_t = tuple(jnp.asarray(
            su_all[:, t * tile:(t + 1) * tile]
            .reshape(3, NBt, S, L).transpose(1, 0, 2, 3))
            for t in range(n_tiles))
        if len(_SETUP_CACHE) > 8:
            _SETUP_CACHE.clear()
        _SETUP_CACHE[key] = (xy_t, su_t)
        hit = (xy_t, su_t)
    xy_tiles = list(hit[0])
    su_tiles = list(hit[1])
    fb_parts = [None] * n_tiles

    if regen:
        kit = 16
        depth = meta.trace_depth
        n_bounce = depth + (1 if itype == INTEGRATOR_STUPID_PT else 0)
        img_parts = []
        nd_parts = []
        for t in range(n_tiles):
            sf, su2, rows = _regen_start(pk, xy_tiles[t], su_tiles[t],
                                         depth, itype, kit, interpret)
            iters = kit
            max_iters = spp * (n_bounce + 2) + kit  # fixed-chain cost bound
            while iters < max_iters:
                mean_done = float(_regen_done_mean(su2))
                if mean_done >= spp:
                    break
                rate = max(mean_done / iters, 1.0 / (n_bounce + 2))
                rem = max(1, int(math.ceil((spp - mean_done) / (rate * kit))))
                for _ in range(rem):
                    sf, su2, rows = _regen_cont(pk, xy_tiles[t], sf, su2,
                                                rows, depth, itype, kit,
                                                interpret)
                iters += rem * kit
                if progress:
                    print(f'rendering, progress = '
                          f'{100.0 * min(mean_done / spp, 1.0):.2f} %',
                          end='\r')
            img4, nd = _regen_finalize(pk, sf, su2, itype)
            img_parts.append(img4)
            nd_parts.append(nd)
        if progress:
            print()
        flat = jnp.concatenate(img_parts, axis=1)
        nd_all = np.asarray(jnp.concatenate(nd_parts))[:N]
        samples_done = int(nd_all.astype(np.int64).sum())
        out = np.asarray(flat).T[:N]
        total = _time.time() - t0
        img = out.reshape(H, W, 4)[..., :channels]
        if return_timing:
            return img, dict(total_s=total, spp=spp, rays=N * spp,
                             samples=samples_done)
        return img

    done = 0
    while done < spp:
        kk = min(k, spp - done)
        for t in range(n_tiles):
            fb, su_tiles[t] = _render_chunk(pk, xy_tiles[t], su_tiles[t],
                                            meta.trace_depth, itype, kk,
                                            interpret)
            fb_parts[t] = fb if fb_parts[t] is None else fb_parts[t] + fb
        done += kk
        if progress:
            print(f'rendering, progress = {100.0 * done / spp:.2f} %',
                  end='\r')
    if progress:
        print()
    # device-side flatten + ONE transfer (per-tile pulls through the device
    # relay dominated otherwise)
    flat = jnp.concatenate([p.transpose(1, 0, 2, 3).reshape(4, -1)
                            for p in fb_parts], axis=1)
    out = np.asarray(flat).T[:N]
    total = _time.time() - t0
    img = (out / float(spp)).reshape(H, W, 4)[..., :channels]
    if return_timing:
        return img, dict(total_s=total, spp=spp, rays=N * spp)
    return img
