"""Kelemen-style primary-sample-space MLT (reference mlt/integrator_kmlt.cpp).

The reference runs one Markov chain per OpenMP thread (integrator_kmlt.cpp:
285-444); here thousands of chains run as vmapped lanes: each chain owns a
primary-sample vector of ``6 + 10 * depth`` floats, mutated with the Kelemen
kernel (:64-85, screen coeff 128 / bsdf coeff 64, large-step prob 0.25),
evaluated by the SAME batched estimator (rands served from the vector), and
splatted to both old and new pixels with scatter-adds replacing the atomics.
Brightness normalization follows :446-477.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..scene.build import Scene, SceneMeta
from ..ops import rng as RNG
from .. import render as R
from . import integrator_pt as IPT

MUTATE_COEFF_SCREEN = 128.0
MUTATE_COEFF_BSDF = 64.0
P_LARGE = 0.25
BOUNCE_START = 6
PER_BOUNCE = 10


def rands_per_chain(depth: int) -> int:
    n = BOUNCE_START + PER_BOUNCE * depth
    return (n + 15) // 16 * 16  # AlignedSize(, 16)


def mutate_kelemen(value, r1, r2, p2, p1=1024.0):
    """MutateKelemen (integrator_kmlt.cpp:64-85), batched."""
    s1 = 1.0 / p1
    s2 = 1.0 / p2
    power = -np.log(s2 / s1)
    dv = jnp.maximum(s2 * (jnp.exp(power * jnp.sqrt(r1)) - np.exp(power)), 0.0)
    plus = value + dv
    plus = jnp.where(plus > 1.0, plus - 1.0, plus)
    minus = value - dv
    minus = jnp.where(minus < 0.0, minus + 1.0, minus)
    return jnp.where(r2 < 0.5, plus, minus)


def _contrib_func(color):
    """contribFunc (integrator_kmlt.cpp:231-234)."""
    return jnp.maximum(0.333334 * (color[..., 0] + color[..., 1] + color[..., 2]), 0.0)


def _eval_f(scene, meta, rands, rng_state, render_layer):
    """PathTraceF: full MIS estimator with rands from the chain vector.

    Returns (color [C,4] incl. exposure, pixel_id [C], rng)."""
    C_ = rands.shape[0]
    pixel_ids = jnp.zeros((C_,), jnp.int32)
    ctx = dict(mlt_rands=rands)
    contrib, rng_state, out_px = R._one_sample(
        scene, meta, rng_state, pixel_ids, IPT.INTEGRATOR_MIS_PT,
        render_layer, 4, ctx)
    return contrib, out_px, rng_state


@functools.partial(jax.jit, static_argnames=('meta', 'render_layer', 'n_steps'))
def mlt_steps(scene: Scene, meta: SceneMeta, chain, render_layer: int,
              n_steps: int):
    """Run n_steps Metropolis transitions for all chains; returns
    (new chain state, fb [W*H,4] splat sum, stats)."""
    W, H = meta.width, meta.height

    def one_step(carry, _):
        (x_vec, y_val, y_color, y_px, gen1, gen2, rng_eval,
         fb, accum_b, n_large, n_accept) = carry
        C_, R_ = x_vec.shape

        gen1, r_large = RNG.rnd_float1(gen1)
        is_large = r_large < P_LARGE

        # large step: all-fresh vector (drawn 4 floats per NextState like ref)
        draws = []
        g2 = gen2
        for i in range(0, R_, 4):
            g2, r4 = RNG.rnd_float4(g2)
            draws.append(r4)
        fresh = jnp.concatenate(draws, axis=-1)[..., :R_]
        gen2_large = g2

        # small step: Kelemen mutation (screen dims 0/1, rest bsdf coeff)
        g2 = gen2
        g2, r1 = RNG.rnd_float4(g2)
        g2, r2 = RNG.rnd_float4(g2)
        m0 = mutate_kelemen(x_vec[..., 0], r1[..., 0], r1[..., 1], MUTATE_COEFF_SCREEN)
        m1 = mutate_kelemen(x_vec[..., 1], r1[..., 2], r1[..., 3], MUTATE_COEFF_SCREEN)
        m2 = mutate_kelemen(x_vec[..., 2], r2[..., 0], r2[..., 1], MUTATE_COEFF_BSDF)
        m3 = mutate_kelemen(x_vec[..., 3], r2[..., 2], r2[..., 3], MUTATE_COEFF_BSDF)
        rest = []
        for i in range(4, R_, 2):
            g2, r = RNG.rnd_float4(g2)
            rest.append(mutate_kelemen(x_vec[..., i], r[..., 0], r[..., 1], MUTATE_COEFF_BSDF))
            if i + 1 < R_:
                rest.append(mutate_kelemen(x_vec[..., i + 1], r[..., 2], r[..., 3], MUTATE_COEFF_BSDF))
        mutated = jnp.stack([m0, m1, m2, m3] + rest, axis=-1)
        gen2_small = g2

        x_new = jnp.where(is_large[..., None], fresh, mutated)
        gen2 = jnp.where(is_large[..., None], gen2_large, gen2_small)

        y_new_color, new_px, rng_eval = _eval_f(scene, meta, x_new, rng_eval,
                                                render_layer)
        y_new = _contrib_func(y_new_color)

        a = jnp.where(y_val == 0.0, 1.0, jnp.minimum(1.0, y_new / jnp.maximum(y_val, 1e-30)))
        gen1, p = RNG.rnd_float1(gen1)
        accept = p <= a

        # splat (integrator_kmlt.cpp:413-444)
        contrib_y = y_new_color[..., :3] * (a / jnp.maximum(y_new, 1e-6))[..., None]
        contrib_x = y_color[..., :3] * ((1.0 - a) / jnp.maximum(y_val, 1e-6))[..., None]
        fb = fb.at[y_px, :3].add(contrib_x)
        fb = fb.at[new_px, :3].add(contrib_y)

        accum_b = accum_b + jnp.where(is_large, y_new, 0.0)
        n_large = n_large + is_large.astype(jnp.int32)
        n_accept = n_accept + accept.astype(jnp.int32)

        acc = accept[..., None]
        x_vec = jnp.where(acc, x_new, x_vec)
        y_val = jnp.where(accept, y_new, y_val)
        y_color = jnp.where(acc, y_new_color, y_color)
        y_px = jnp.where(accept, new_px, y_px)

        return (x_vec, y_val, y_color, y_px, gen1, gen2, rng_eval,
                fb, accum_b, n_large, n_accept), None

    carry, _ = jax.lax.scan(one_step, chain, None, length=n_steps)
    return carry


def render_mlt(scene: Scene, meta: SceneMeta, spp: int = 64,
               n_chains: int = 8192, channels: int = 4,
               render_layer: int = IPT.FB_INDIRECT,
               steps_per_dispatch: int = 8, progress: bool = False,
               seed: int = 0, verbose: bool = True):
    """The FB_INDIRECT MLT block (PathTraceBlock, integrator_kmlt.cpp:248+).

    Total mutations = W*H*spp (like pixelsNum*a_passNum). Returns the
    brightness-normalized framebuffer [H, W, 4] (already divided by passNum).
    """
    W, H = meta.width, meta.height
    N = W * H
    depth = meta.trace_depth
    R_ = rands_per_chain(depth)
    C_ = n_chains

    total_steps = max(1, (N * spp) // C_)

    ids = np.arange(C_)
    gen1 = RNG.gen_init(jnp.asarray(ids * 7 + 1 + seed))
    gen2 = RNG.gen_init(jnp.asarray(ids + seed))
    for i in range(27):  # warm-up 10 + tid%17 (masked like the reference)
        mask = jnp.asarray(i < 10 + ids % 17)
        gen1, _ = RNG._next_state_masked(gen1, mask)
        gen2, _ = RNG._next_state_masked(gen2, mask)

    # initial state
    draws = []
    g2 = gen2
    for i in range(0, R_, 4):
        g2, r4 = RNG.rnd_float4(g2)
        draws.append(r4)
    gen2 = g2
    x_vec = jnp.concatenate(draws, axis=-1)[..., :R_]
    rng_eval = RNG.gen_init(jnp.arange(C_))
    y_color, y_px, rng_eval = jax.jit(
        _eval_f, static_argnames=('meta', 'render_layer'))(
        scene, meta, x_vec, rng_eval, render_layer)
    y_val = _contrib_func(y_color)

    fb = jnp.zeros((N, 4), jnp.float32)
    chain = (x_vec, y_val, y_color, y_px, gen1, gen2, rng_eval,
             fb, jnp.zeros((C_,)), jnp.zeros((C_,), jnp.int32),
             jnp.zeros((C_,), jnp.int32))

    done = 0
    while done < total_steps:
        n = min(steps_per_dispatch, total_steps - done)
        chain = mlt_steps(scene, meta, chain, render_layer, n)
        done += n
        if progress:
            print(f'rendering (mlt), progress = {100.0 * done / total_steps:.2f} %',
                  end='\r')
    if progress:
        print()

    (x_vec, y_val, y_color, y_px, gen1, gen2, rng_eval,
     fb, accum_b, n_large, n_accept) = chain

    fb = np.asarray(fb)
    avg_brightness = float(jnp.sum(accum_b) / jnp.maximum(jnp.sum(n_large), 1))
    acceptance = float(jnp.sum(n_accept)) / float(total_steps * C_)
    actual_brightness = float(np.maximum(
        0.333334 * fb[:, :3].sum(-1), 0.0).mean())
    if verbose:
        print(f'[IntegratorKMLT]: average brightness      = {avg_brightness:.2f}')
        print(f'[IntegratorKMLT]: average acceptance rate = {100.0 * acceptance:.2f}%')
    # normConst = avgBrightness/actualBrightness exactly as the reference
    # (integrator_kmlt.cpp:461-473): the splat image's mean is FORCED to the
    # large-step brightness estimate — the reference uses no burn-in and no
    # separate large-step image either (the commented-out m_omcImage path,
    # :457-459/:474-475, is dead code there too)
    norm = avg_brightness / max(actual_brightness, 1e-20)
    img = (fb * norm).reshape(H, W, 4)
    return img[..., :channels]
