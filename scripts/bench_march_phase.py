#!/usr/bin/env python3
"""Two-phase march A/B on realistic city bounce rays (real chip).

Synthesizes bounce-ray populations by bouncing camera rays off the
textured 345k-tri city (cosine hemisphere at each hit), sorts them with
the integrator's (origin-cell, direction) key, and times intersect_march
with different phase-1 caps.  Full readback per iteration + varied t_max
jitter (docs/PERF_NOTES.md "timing pitfall").

Usage: python scripts/bench_march_phase.py [n_rays_log2] [p1 values...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hydracore3_tpu.scene import synth
from hydracore3_tpu.accel import traverse_dda as TD
from hydracore3_tpu.accel import traverse_stream as TS


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    p1s = [int(a) for a in sys.argv[2:]] or [0, 16, 32, 64]
    N = 1 << n_log2
    scene, meta = synth.city_scene(width=1024, height=1024, depth=5,
                                   textured=True)
    grid, tris = scene.st_grid, scene.st_tris
    rng = np.random.default_rng(5)

    # camera rays over the whole image
    cx, cy, cz = 0.0, 60.0, -140.0
    xs = rng.uniform(-1, 1, N).astype(np.float32)
    ys = rng.uniform(-0.6, 0.2, N).astype(np.float32)
    d = np.stack([xs, ys, np.ones(N, np.float32)], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos = np.broadcast_to(np.array([cx, cy, cz], np.float32), (N, 3)).copy()
    pos_j, dir_j = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((N,), jnp.float32)
    tmax = jnp.full((N,), 3.0e38, jnp.float32)

    def bounce(pos_j, dir_j, seed):
        t, tri, u, v = TD.intersect_march(grid, tris, pos_j, dir_j, tmin,
                                          tmax, phase1_max=0)
        hit = tri >= 0
        hp = pos_j + t[:, None] * dir_j
        # geometric normal from the committed soup
        safe = jnp.maximum(tri, 0)
        e1 = scene.tri_e1[safe]
        e2 = scene.tri_e2[safe]
        n = jnp.cross(e1, e2)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        n = jnp.where((jnp.sum(n * dir_j, -1) > 0)[:, None], -n, n)
        r = np.random.default_rng(seed)
        u1 = jnp.asarray(r.uniform(0, 1, N).astype(np.float32))
        u2 = jnp.asarray(r.uniform(0, 1, N).astype(np.float32))
        # cosine hemisphere around n
        st_ = jnp.sqrt(u1)
        phi = 2 * np.pi * u2
        lx = st_ * jnp.cos(phi)
        ly = st_ * jnp.sin(phi)
        lz = jnp.sqrt(jnp.maximum(1 - u1, 0.0))
        up = jnp.where((jnp.abs(n[:, 2:3]) < 0.9), jnp.array([[0., 0., 1.]]),
                       jnp.array([[1., 0., 0.]]))
        tang = jnp.cross(up, n)
        tang = tang / jnp.maximum(jnp.linalg.norm(tang, -1, keepdims=True), 1e-20)
        bit = jnp.cross(n, tang)
        nd = lx[:, None] * tang + ly[:, None] * bit + lz[:, None] * n
        np_ = hp + 1e-3 * n
        # dead lanes (miss): recycle as sky rays pointing down into scene
        return (jnp.where(hit[:, None], np_, pos_j),
                jnp.where(hit[:, None], nd, dir_j), hit)

    alive = jnp.ones((N,), bool)
    for b in range(3):
        pos_j, dir_j, hit = bounce(pos_j, dir_j, 100 + b)
        live = alive & hit
        alive = live
        jax.block_until_ready(pos_j)
        # sort with the integrator's key
        lo = jnp.asarray(grid.lo, jnp.float32)
        h = jnp.asarray(grid.h, jnp.float32)
        d1, d2 = grid.dims[1], grid.dims[2]
        q = jnp.clip(jnp.floor((pos_j - lo[None]) / h[None]).astype(jnp.int32),
                     0, jnp.asarray(grid.dims, jnp.int32)[None] - 1)
        cell = q[:, 0] * (d1 * d2) + q[:, 1] * d2 + q[:, 2]
        uq = jnp.clip(dir_j[:, 0] * 16 + 16, 0, 31).astype(jnp.int32)
        vq = jnp.clip(dir_j[:, 1] * 16 + 16, 0, 31).astype(jnp.int32)
        key = cell * 1024 + (uq * 32 + vq)
        # dead lanes: sort to the end with an EMPTY interval, exactly like
        # the integrator (dead tiles early-exit; they are not re-marched)
        key = jnp.where(live, key, jnp.int32(0x7FFFFFFF))
        perm = jnp.argsort(key)
        ps, ds = pos_j[perm], dir_j[perm]
        live_s = live[perm]
        tmin_b = jnp.where(live_s, 0.0, 1.0)
        tmax_b = jnp.where(live_s, 3.0e38, 0.0)
        if b == 0:
            continue  # bounce-0 rays are coherent camera rays; skip timing

        print(f'== bounce {b}: {int(live.sum())} live / {N}')
        for p1 in p1s:
            # vary tmax jitter each rep to defeat caching; full readback
            reps = 3
            # warmup
            o = TD.intersect_march(grid, tris, ps, ds, tmin_b,
                                   tmax_b * (1.0 - 1e-6), phase1_max=p1)
            np.asarray(o[0])
            t0 = time.time()
            for i in range(reps):
                o = TD.intersect_march(grid, tris, ps, ds, tmin_b,
                                       tmax_b * (1.0 - 1e-6 * (i + 2)),
                                       phase1_max=p1)
                np.asarray(o[0])
            dt = (time.time() - t0) / reps
            print(f'   p1={p1:3d}: {dt*1e3:8.1f} ms  '
                  f'{N/dt/1e6:6.2f} Mrays/s')


if __name__ == '__main__':
    main()
