"""Differentiable rendering (the diff_render/ subsystem, SURVEY.md §2.9).

The reference's Enzyme record/replay machinery collapses into ``jax.grad``
of the SAME batched estimator used for forward rendering: the random streams
are functions of the RNG state only (constants under differentiation), BVH
hits and shadow-occlusion bits are discrete and receive no cotangents, and
the trainable parameters are texel ranges of the texture pool (PutDiffTex2D,
integrator_dr.cpp:33-53) scattered into the pool inside the loss — so
gradients flow through the ordinary bilinear sampler (Tex2DFetchAD analog,
integrator_dr.cpp:95-161).

Loss matches PixelLossPT (integrator_dr.cpp:1103-1132): per pixel-sample
L2 over RGB vs the reference image; gradients summed over pixels and passes.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.build import Scene, SceneMeta
from ..ops import rng as RNG
from .. import render as R
from . import integrator_pt as IPT


@dataclasses.dataclass(frozen=True)
class DiffTexSetup:
    """Registration of one texture slot as trainable (PutDiffTex2D analog)."""
    slot: int
    texel_offset: int
    width: int
    height: int

    @property
    def size(self):
        return self.width * self.height


def put_diff_tex(scene: Scene, slot: int) -> DiffTexSetup:
    return DiffTexSetup(
        slot=slot,
        texel_offset=int(scene.textures.offset[slot]),
        width=int(scene.textures.width[slot]),
        height=int(scene.textures.height[slot]))


def scene_with_params(scene: Scene, setup: DiffTexSetup, params):
    """Scatter the trainable texels [H*W, 4] into the pool (differentiable).

    Disables the quad-packed fast path: quads are a build-time cache of the
    texel array (Tex2DFetchAD analog, integrator_dr.cpp:95-161 — the
    differentiable fetch reads raw params, the engine sampler otherwise)."""
    texels = scene.textures.texels.at[
        setup.texel_offset:setup.texel_offset + setup.size].set(params)
    textures = dataclasses.replace(scene.textures, texels=texels,
                                   quad_texels=None)
    # the const-texture fold (scene/build.py mat_tex0_const) would read a
    # stale baked value instead of the trainable texels — disable it
    return dataclasses.replace(scene, textures=textures, mat_tex0_const=None)


def pixel_loss(params, scene: Scene, meta: SceneMeta, setup: DiffTexSetup,
               rng_state, pixel_ids, ref_pixels, integrator_type=IPT.INTEGRATOR_MIS_PT):
    """Summed per-sample L2 loss vs reference pixels.

    ref_pixels: [N, 3] float32 (already in framebuffer row order).
    Returns (loss_sum, (contrib, new_rng)).
    """
    scene2 = scene_with_params(scene, setup, params)
    contrib, new_rng, _ = R._one_sample(scene2, meta, rng_state, pixel_ids,
                                        integrator_type, IPT.FB_COLOR, 4)
    diff = contrib[..., :3] - ref_pixels[..., :3]
    loss = jnp.sum(diff * diff)
    return loss, (contrib, new_rng)


@functools.partial(jax.jit, static_argnames=('meta', 'setup', 'integrator_type'))
def loss_and_grad(params, scene, meta, setup, rng_state, pixel_ids, ref_pixels,
                  integrator_type=IPT.INTEGRATOR_MIS_PT):
    """One pass of PathTraceDR: value+grad of the summed pixel loss."""
    (loss, (contrib, new_rng)), grads = jax.value_and_grad(
        pixel_loss, has_aux=True)(params, scene, meta, setup, rng_state,
                                  pixel_ids, ref_pixels, integrator_type)
    return loss, grads, contrib, new_rng


def adam_hydra_step(params, grads, state, it, lr_gamma=0.25):
    """The reference's thesis-variant Adam (diff_render/adam.h:33-67)."""
    momentum, gsquare = state
    factor_gamma = it // 100 + 1
    alpha, beta = 0.5, 0.25
    gamma = lr_gamma / factor_gamma
    momentum = momentum * beta + grads * (1.0 - beta)
    gsquare = 2.0 * (gsquare * alpha + grads * grads * (1.0 - alpha))
    params = params - gamma * momentum / jnp.sqrt(gsquare + 1e-8)
    return params, (momentum, gsquare)


def adam2_step(params, grads, state, it, lr=0.15, beta_1=0.9, beta_2=0.999,
               eps=1e-8):
    """Paper Adam (diff_render/adam.h:70-103 AdamOptimizer2)."""
    v, s = state
    v = beta_1 * v + (1 - beta_1) * grads
    s = beta_2 * s + (1 - beta_2) * grads * grads
    vh = v / (1 - beta_1 ** (it + 1))
    sh = s / (1 - beta_2 ** (it + 1))
    params = params - lr * vh / (jnp.sqrt(sh) + eps)
    return params, (v, s)


def gd_step(params, grads, state, it, lr=0.25):
    """Plain gradient descent (diff_render/adam.h OptimizerGD)."""
    return params - lr * grads, state


def optimize_texture(scene: Scene, meta: SceneMeta, setup: DiffTexSetup,
                     ref_img: np.ndarray, iters: int = 50, spp: int = 4,
                     lr: float = 0.15, optimizer: str = 'adam2',
                     init_value: float = 1.0, verbose: bool = True):
    """The drmain.cpp optimization loop (diff_render/drmain.cpp:174-262).

    ref_img: [H, W, C>=3] reference image in framebuffer order.
    Returns (params [H*W,4], losses list).
    """
    N = meta.width * meta.height
    pixel_ids = jnp.arange(N, dtype=jnp.int32)
    ref = jnp.asarray(np.asarray(ref_img[..., :3], np.float32).reshape(N, 3))

    params = jnp.full((setup.size, 4), init_value, jnp.float32)
    state = (jnp.zeros_like(params), jnp.zeros_like(params))
    step_fn = {'adam2': adam2_step, 'adam': adam_hydra_step,
               'gd': gd_step}[optimizer]

    losses = []
    for it in range(iters):
        rng_state = RNG.gen_init(pixel_ids)  # fresh streams per iteration pass
        total_loss = 0.0
        grads_acc = jnp.zeros_like(params)
        for _p in range(spp):
            loss, grads, _, rng_state = loss_and_grad(
                params, scene, meta, setup, rng_state, pixel_ids, ref)
            total_loss += float(loss)
            grads_acc = grads_acc + grads
        params, state = step_fn(params, grads_acc, state, it, lr) \
            if optimizer != 'adam2' else adam2_step(params, grads_acc, state, it, lr)
        losses.append(total_loss / (N * spp))
        if verbose:
            print(f'iter {it:3d}: loss = {losses[-1]:.6f}')
    return params, losses


# ---------------------------------------------------------------------------
# Regularizers (diff_render/integrator_dr.cpp:282-367, Enzyme-differentiated
# in the reference — plain differentiable jnp here)
# ---------------------------------------------------------------------------

def reg_loss_image_1d(data):
    """RegLossImage1D: mean squared neighbor differences of a 1-D signal."""
    d = data.reshape(-1)
    left = d[1:-1] - d[:-2]
    right = d[1:-1] - d[2:]
    return jnp.sum(left * left + right * right) / d.shape[0]


def reg_loss_image_2d4f(params, width, height):
    """RegLossImage2D4f: interior sum of sqrt(TV^2) over RGB, accumulated
    center-out by rows like the reference (integrator_dr.cpp:317-348)."""
    img = params.reshape(height, width, -1)[..., :3]
    p0 = img[1:-1, 1:-1]
    dt = p0 - img[2:, 1:-1]
    db = p0 - img[:-2, 1:-1]
    dl = p0 - img[1:-1, :-2]
    dr = p0 - img[1:-1, 2:]

    def d3(a):
        return jnp.sum(a * a, -1)

    per_px = jnp.sqrt(d3(dl) + d3(dr) + d3(dt) + d3(db) + 1e-20)
    return jnp.sum(per_px)


# ---------------------------------------------------------------------------
# Material-scalar parameter registry (beyond textures): train packed
# material rows (colors/data), the reference's a_data seam generalized
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DiffMatSetup:
    """Registers material-row float columns as trainable: params [n_mats,
    n_cols] scatter into scene.mat_packed_f32[mat_ids, cols]."""
    mat_ids: tuple
    cols: tuple  # column indices into the packed f32 row (0:16 colors, ...)


def scene_with_mat_params(scene: Scene, setup: DiffMatSetup, params):
    rows = jnp.asarray(setup.mat_ids, jnp.int32)[:, None]
    cols = jnp.asarray(setup.cols, jnp.int32)[None, :]
    packed = scene.mat_packed_f32.at[rows, cols].set(params)
    return dataclasses.replace(scene, mat_packed_f32=packed)


def mat_loss_and_grad(params, scene, meta, setup: DiffMatSetup, rng_state,
                      pixel_ids, ref_pixels,
                      integrator_type=IPT.INTEGRATOR_MIS_PT):
    """Value+grad of the pixel loss w.r.t. material scalars."""
    def loss_fn(p):
        scene2 = scene_with_mat_params(scene, setup, p)
        contrib, new_rng, _ = R._one_sample(scene2, meta, rng_state, pixel_ids,
                                            integrator_type, IPT.FB_COLOR, 4)
        diff = contrib[..., :3] - ref_pixels[..., :3]
        return jnp.sum(diff * diff), new_rng

    (loss, new_rng), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, grads, new_rng


# ---------------------------------------------------------------------------
# Whitted-AD variant (RayTraceDR/CastRayDR, integrator_dr.cpp:260-459)
# ---------------------------------------------------------------------------

def whitted_loss_and_grad(params, scene, meta, setup: DiffTexSetup, pixel_ids,
                          ref_pixels):
    """Gradient of the Whitted ray-tracer's pixel loss w.r.t. diff-texture
    texels — the reference's single-bounce AD path."""
    from . import integrator_rt as RT

    def loss_fn(p):
        scene2 = scene_with_params(scene, setup, p)
        img = RT.ray_trace(scene2, meta, pixel_ids)
        diff = img[..., :3] - ref_pixels[..., :3]
        return jnp.sum(diff * diff)

    return jax.value_and_grad(loss_fn)(params)


# ---------------------------------------------------------------------------
# Jitted scan-based optimization loop (the host Python loop in
# optimize_texture dispatches per spp; this fuses an entire Adam iteration
# — spp-accumulated grads + the update — into ONE device program)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=('meta', 'setup', 'spp',
                                             'reg_weight', 'lr'))
def _opt_iteration(params, opt_state, it, scene, meta, setup, rng_state,
                   pixel_ids, ref, spp: int, reg_weight: float, lr: float):
    def body(_, carry):
        rng, loss_acc, grads_acc = carry
        (loss, (_, rng)), grads = jax.value_and_grad(
            pixel_loss, has_aux=True)(params, scene, meta, setup, rng,
                                      pixel_ids, ref)
        return rng, loss_acc + loss, grads_acc + grads

    rng, loss, grads = jax.lax.fori_loop(
        0, spp, body, (rng_state, jnp.float32(0), jnp.zeros_like(params)))
    if reg_weight > 0.0:
        rloss, rgrads = jax.value_and_grad(
            lambda p: reg_loss_image_2d4f(p, setup.width, setup.height))(params)
        loss = loss + reg_weight * rloss
        grads = grads + reg_weight * rgrads
    params2, opt_state2 = adam2_step(params, grads, opt_state, it, lr)
    return params2, opt_state2, loss, rng


def optimize_texture_scan(scene: Scene, meta: SceneMeta, setup: DiffTexSetup,
                          ref_img: np.ndarray, iters: int = 50, spp: int = 4,
                          lr: float = 0.15, reg_weight: float = 0.0,
                          init_value: float = 1.0, verbose: bool = True):
    """drmain loop with the whole per-iteration work in one jitted program
    (grads accumulate on-device across spp; no host round-trip per pass)."""
    N = meta.width * meta.height
    pixel_ids = jnp.arange(N, dtype=jnp.int32)
    ref = jnp.asarray(np.asarray(ref_img[..., :3], np.float32).reshape(N, 3))
    params = jnp.full((setup.size, 4), init_value, jnp.float32)
    state = (jnp.zeros_like(params), jnp.zeros_like(params))
    losses = []
    rng0 = RNG.gen_init(pixel_ids)
    for it in range(iters):
        # fresh (identical) streams per iteration, like the host-loop
        # variant: the loss is then a deterministic function of the params
        params, state, loss, _ = _opt_iteration(
            params, state, it, scene, meta, setup, rng0, pixel_ids, ref,
            spp, reg_weight, lr)
        losses.append(float(loss) / (N * spp))
        if verbose:
            print(f'iter {it:3d}: loss = {losses[-1]:.6f}')
    return params, losses
