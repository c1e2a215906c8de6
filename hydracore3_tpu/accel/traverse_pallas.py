"""Pallas TPU BVH traversal kernel (SURVEY hard part #1).

The query side of the CrossRT analog (VulkanRTX.cpp GPU ray query /
EmbreeRT.cpp:300-400), designed for the TPU's execution model instead of
per-thread stacks:

  * rays are processed in TILES of 1024 ([8, 128] — exactly one vreg per
    ray component), one grid program per tile;
  * the whole tile walks ONE shared skip-pointer node sequence — the node
    id is a SCALAR, so per-node data are scalar VMEM reads broadcast to
    the vector lanes (no per-lane gathers, the thing XLA cannot avoid);
  * the tile descends a node iff ANY live lane's slab test passes, with
    per-lane best_t keeping the culling conservative per ray;
  * leaves are CLUSTERS of up to 64 triangles intersected densely against
    all 1024 lanes (Moller-Trumbore on [8, 128] vregs) — divergence costs
    a tile only the union of clusters its rays need, and the dense loop is
    pure VPU work.

The BVH is the same binned-SAH skip-pointer layout as accel/build_bvh but
built with max_leaf=CLUSTER (64), i.e. a shallower tree over clusters.
Nodes and triangles live fully in VMEM: supported up to ~170k triangles
(~8 MB); larger scenes fall back to the XLA paths.

Correctness oracle: accel/traverse.intersect_brute (tests compare hits
bit-for-bit on shared-winner scenes and by t elsewhere).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = 3.4e38
TILE = 1024          # rays per grid program: [8, 128]
CLUSTER = 64         # max triangles per leaf
VMEM_TRI_LIMIT = 175_000


def _kernel(nodes_f_ref, nodes_i_ref, tris_ref, rays_ref,
            out_t_ref, out_tri_ref, out_u_ref, out_v_ref, *, any_hit: bool):
    px = rays_ref[0, 0]   # [8, 128]
    py = rays_ref[0, 1]
    pz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]
    tmax = rays_ref[0, 7]

    big = jnp.float32(1e30)
    ix = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, big)
    iy = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, big)
    iz = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, big)

    init = (jnp.int32(0),
            tmax,                                   # best_t
            jnp.full((8, 128), -1, jnp.int32),      # best tri
            jnp.zeros((8, 128), jnp.float32),       # u
            jnp.zeros((8, 128), jnp.float32))       # v

    def cond(state):
        node = state[0]
        return node >= 0

    def body(state):
        node, best_t, best_i, best_u, best_v = state
        bx0 = nodes_f_ref[node, 0]
        by0 = nodes_f_ref[node, 1]
        bz0 = nodes_f_ref[node, 2]
        bx1 = nodes_f_ref[node, 3]
        by1 = nodes_f_ref[node, 4]
        bz1 = nodes_f_ref[node, 5]
        skip = nodes_i_ref[node, 0]
        toff = nodes_i_ref[node, 1]
        tcnt = nodes_i_ref[node, 2]

        # slab test on the whole tile ([8,128] vregs, scalar bounds)
        t0x = (bx0 - px) * ix
        t1x = (bx1 - px) * ix
        t0y = (by0 - py) * iy
        t1y = (by1 - py) * iy
        t0z = (bz0 - pz) * iz
        t1z = (bz1 - pz) * iz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), best_t))
        lane_hit = tn <= tf
        tile_hit = jnp.any(lane_hit)
        is_leaf = tcnt > 0

        def leaf(carry):
            bt, bi, bu, bv = carry

            def tri_body(k, c):
                bt, bi, bu, bv = c
                v0x = tris_ref[toff + k, 0]
                v0y = tris_ref[toff + k, 1]
                v0z = tris_ref[toff + k, 2]
                e1x = tris_ref[toff + k, 3]
                e1y = tris_ref[toff + k, 4]
                e1z = tris_ref[toff + k, 5]
                e2x = tris_ref[toff + k, 6]
                e2y = tris_ref[toff + k, 7]
                e2z = tris_ref[toff + k, 8]
                # pvec = d x e2 (tri components are scalars)
                pvx = dy * e2z - dz * e2y
                pvy = dz * e2x - dx * e2z
                pvz = dx * e2y - dy * e2x
                det = pvx * e1x + pvy * e1y + pvz * e1z
                inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
                tvx = px - v0x
                tvy = py - v0y
                tvz = pz - v0z
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                qvx = tvy * e1z - tvz * e1y
                qvy = tvz * e1x - tvx * e1z
                qvz = tvx * e1y - tvy * e1x
                vv = (dx * qvx + dy * qvy + dz * qvz) * inv
                t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                ok = ((jnp.abs(det) > 1e-12) & (u >= 0.0) & (vv >= 0.0)
                      & (u + vv <= 1.0) & (t > tmin) & (t < bt))
                if any_hit:
                    # occlusion is boolean: collapse the lane's interval so
                    # every later slab test culls it (t is not reported)
                    t = tmin
                return (jnp.where(ok, t, bt),
                        jnp.where(ok, toff + k, bi),
                        jnp.where(ok, u, bu),
                        jnp.where(ok, vv, bv))

            return jax.lax.fori_loop(0, tcnt, tri_body, (bt, bi, bu, bv))

        do_leaf = tile_hit & is_leaf
        best_t, best_i, best_u, best_v = jax.lax.cond(
            do_leaf, leaf, lambda c: c, (best_t, best_i, best_u, best_v))

        descend = tile_hit & ~is_leaf
        if any_hit:
            # Early exit only when NO live lane (tmax > tmin marks lanes the
            # caller actually wants traced) can still become occluded.  The
            # liveness test must be lane-global, NOT this leaf's slab mask: a
            # lane that misses this leaf's AABB but would hit a later leaf
            # would otherwise be dropped as unoccluded (light leaks).
            done = do_leaf & ~jnp.any((best_i < 0) & (tmax > tmin))
            nxt = jnp.where(done, jnp.int32(-1),
                            jnp.where(descend, node + 1, skip))
        else:
            nxt = jnp.where(descend, node + 1, skip)
        return (nxt, best_t, best_i, best_u, best_v)

    node, best_t, best_i, best_u, best_v = jax.lax.while_loop(cond, body, init)
    out_t_ref[0] = best_t
    out_tri_ref[0] = best_i
    out_u_ref[0] = best_u
    out_v_ref[0] = best_v


@functools.partial(jax.jit, static_argnames=('any_hit', 'interpret'))
def intersect_clusters(nodes_f, nodes_i, tris12, ray_pos, ray_dir,
                       t_min, t_max, any_hit: bool = False,
                       interpret: bool = False):
    """Nearest-hit over the cluster BVH via the Pallas kernel.

    nodes_f: [M, 8] f32 (bmin3, bmax3, pad2); nodes_i: [M, 4] i32 (skip,
    tri_offset, tri_count, pad); tris12: [Tpad, 12] f32 (v0, e1, e2, pad).
    Returns (t, tri_idx, u, v) with tri_idx -1 on miss; t in leaf order.
    """
    N = ray_pos.shape[0]
    n_tiles = -(-N // TILE)
    pad = n_tiles * TILE - N
    if pad:
        ray_pos = jnp.concatenate([ray_pos, jnp.zeros((pad, 3), jnp.float32)])
        ray_dir = jnp.concatenate([ray_dir, jnp.ones((pad, 3), jnp.float32)])
        t_min = jnp.concatenate([t_min, jnp.zeros((pad,), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])

    rays = jnp.stack([ray_pos[:, 0], ray_pos[:, 1], ray_pos[:, 2],
                      ray_dir[:, 0], ray_dir[:, 1], ray_dir[:, 2],
                      t_min, t_max], axis=0)           # [8, Npad]
    rays = rays.reshape(8, n_tiles, 8, 128).transpose(1, 0, 2, 3)

    grid = (n_tiles,)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
    ]
    tile_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid=grid,
        in_specs=[
            pl.BlockSpec(nodes_f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes_i.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tris12.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 8, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(nodes_f, nodes_i, tris12, rays)

    t, tri, u, v = [o.reshape(n_tiles * TILE)[ :N] for o in outs]
    return t, tri, u, v


def pack_cluster_bvh(bvh, v0, e1, e2):
    """Host-side packing of a FlatBVH (max_leaf=CLUSTER) + leaf-ordered
    triangles into the kernel's VMEM arrays."""
    M = len(bvh.bmin)
    nodes_f = np.zeros((M, 8), np.float32)
    nodes_f[:, 0:3] = bvh.bmin
    nodes_f[:, 3:6] = bvh.bmax
    nodes_i = np.zeros((M, 4), np.int32)
    nodes_i[:, 0] = bvh.skip
    nodes_i[:, 1] = np.maximum(bvh.tri_offset, 0)
    nodes_i[:, 2] = bvh.tri_count
    T = len(v0)
    tris12 = np.zeros((max(T, 1), 12), np.float32)
    tris12[:T, 0:3] = v0
    tris12[:T, 3:6] = e1
    tris12[:T, 6:9] = e2
    return nodes_f, nodes_i, tris12
