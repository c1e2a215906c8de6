"""Device mesh + sharding for multi-chip rendering (SURVEY.md §2.5).

The workload is pure data parallelism over rays/pixels: scene tables are
MB-scale and replicated, the framebuffer is sharded by pixel tile, and (in
the differentiable path) parameter gradients are ``psum``-all-reduced over
the ``data`` axis — the reference's per-OMP-thread gradient buffers + final
reduction (integrator_dr.cpp:1141-1204) become one collective.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

DATA_AXIS = 'data'


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def sharded_render_tile(mesh: Mesh, scene, meta, integrator_type: int = 2,
                        render_layer: int = 0, channels: int = 4,
                        n_iters: int = 1):
    """Build a pjit-able function rendering a pixel batch sharded over chips.

    Per-pixel radiance stays local to the owning chip (no communication at
    all in the forward pass, matching SURVEY §2.5 P5)."""
    from .. import render as R

    def tile_fn(scene_, rng_state, pixel_ids):
        return R._render_tile.__wrapped__(scene_, meta, rng_state, pixel_ids,
                                          integrator_type, render_layer,
                                          channels, n_iters)

    fn = shard_map(
        tile_fn, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_rep=False)
    return jax.jit(fn)


def sharded_train_step(mesh: Mesh, scene, meta, loss_fn):
    """DP training step: per-chip pixel shard, psum'd parameter gradients.

    loss_fn(params, scene, rng, pixel_ids, ref_pixels) -> scalar local loss.
    Returns jitted step(params, rng, pixel_ids, ref) -> (loss, grads) with
    grads already all-reduced over ICI (jax.lax.pmean inside shard_map).
    """
    def local_step(params, rng_state, pixel_ids, ref):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, rng_state,
                                                  pixel_ids, ref)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        return loss, grads

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(fn)
