#!/usr/bin/env python3
"""Traversal micro-benchmark on the real chip: brute / XLA while-BVH /
Pallas cluster kernel, small and sponza-scale synthetic scenes.

Usage: python scripts/bench_traversal.py [n_tris ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from hydracore3_tpu.accel import build_bvh
from hydracore3_tpu.accel import traverse as TRV
from hydracore3_tpu.accel import traverse_pallas as TP


def scene(rng, n_tris, spread):
    # clustered "city": triangles grouped into spatial blobs like real
    # meshes (uniform soup is the BVH worst case and unrepresentative)
    n_blobs = max(1, n_tris // 512)
    centers = rng.uniform(-spread, spread, (n_blobs, 3)).astype(np.float32)
    which = rng.integers(0, n_blobs, n_tris)
    v0 = centers[which] + rng.normal(0, 0.8, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.25, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.25, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


def timeit(f, *args, n=5):
    r = f(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def make_rays(rng, N, spread, kind):
    if kind == 'camera':
        # coherent primary rays: one origin, directions through a pixel grid
        side = int(np.sqrt(N))
        ys, xs = np.mgrid[0:side, 0:side].astype(np.float32) / side - 0.5
        d = np.stack([xs.ravel(), ys.ravel(),
                      np.full(side * side, 1.0, np.float32)], -1)
        d = np.concatenate([d, d[: N - len(d)]]) if len(d) < N else d[:N]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pos = np.tile(np.array([0, 0, -2.2 * spread], np.float32), (N, 1))
        return pos, d
    # 'bounce': coherent origins (surface patches), random directions —
    # the diffuse-bounce workload
    n_patch = N // 1024
    centers = rng.uniform(-spread, spread, (n_patch, 3)).astype(np.float32)
    pos = np.repeat(centers, 1024, axis=0)[:N]
    pos += rng.normal(0, 0.3, (N, 3)).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return pos.astype(np.float32), d.astype(np.float32)


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [2_000, 50_000, 250_000]
    rng = np.random.default_rng(0)
    N = 1 << 20  # 1M rays

    for T in sizes:
      spread = 8.0 * (T / 2000.0) ** (1 / 3)
      v0, e1, e2 = scene(rng, T, spread)
      for kind in ('camera', 'bounce'):
        pos, d = make_rays(rng, N, spread, kind)
        pos_j, d_j = jnp.asarray(pos), jnp.asarray(d)
        tmin = jnp.zeros((N,))
        tmax = jnp.full((N,), 1e30)

        # pallas cluster kernel
        cb = build_bvh.build(v0, e1, e2, max_leaf=TP.CLUSTER)
        order = cb.order
        nf, ni, t12 = TP.pack_cluster_bvh(cb, v0[order], e1[order], e2[order])
        nf, ni, t12 = jnp.asarray(nf), jnp.asarray(ni), jnp.asarray(t12)

        @jax.jit
        def pallas_hit(p, dd):
            return TP.intersect_clusters(nf, ni, t12, p, dd, tmin, tmax)

        dt = timeit(pallas_hit, pos_j, d_j)
        print(f'T={T:7d} {kind:6s} pallas-cluster: {dt*1e3:8.2f} ms '
              f'-> {N/dt/1e6:8.1f} Mrays/s', flush=True)

        # brute force (small scenes only)
        if T <= 50_000:
            zi = jnp.zeros(T, jnp.int32)
            bv0, be1, be2 = jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)

            @jax.jit
            def brute(p, dd):
                h = TRV.intersect_brute(bv0, be1, be2, zi, zi, zi,
                                        p, dd, tmin, tmax)
                return h.t

            dt = timeit(brute, pos_j, d_j, n=2)
            print(f'T={T:7d} {kind:6s} brute         : {dt*1e3:8.2f} ms '
                  f'-> {N/dt/1e6:8.1f} Mrays/s', flush=True)


if __name__ == '__main__':
    main()
