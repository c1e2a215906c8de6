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
    return dataclasses.replace(scene, textures=textures)


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
    step_fn = adam2_step if optimizer == 'adam2' else adam_hydra_step

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
