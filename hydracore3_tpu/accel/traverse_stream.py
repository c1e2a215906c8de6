"""Pallas TPU streaming BVH traversal — the LARGE-scene ray-query path.

The round-3 cluster kernel (traverse_pallas.py) holds nodes AND triangles in
VMEM and therefore caps at ~175k triangles; the reference's perf ledger is
measured on sponza-class scenes (~262k tris, testing/perf.txt:2-8, queried
through Embree / VK_KHR_ray_query — external/CrossRT/EmbreeRT.cpp:310-457,
VulkanRTX.cpp).  This kernel removes the cap with the classic TPU recipe:
keep the hot small data on-chip, stream the big data from HBM:

  * the cluster-BVH NODE arrays stay fully VMEM-resident — at 64 tris per
    leaf they are ~48 B/node and ~2 nodes per cluster, i.e. ~1.5 MB even at
    one MILLION triangles;
  * TRIANGLES live in HBM as cluster-blocked Woop-transform coefficients
    ([C, 4, 256] f32, 4 KB per cluster, lane-aligned) DMA'd on demand;
  * each [8,128] ray tile alternates two phases:
      1. WALK: descend the shared skip-pointer node sequence (scalar node
         id -> scalar VMEM reads broadcast to lanes, no per-lane gathers),
         pushing hit leaves' cluster slots into an SMEM queue;
      2. FLUSH: run the queue through double-buffered DMA (prefetch
         cluster k+1 while intersecting cluster k) with DENSE [64, R]
         intersection math — the same broadcast-FMA Woop form as the
         megakernel's brute trace (models/megakernel.py:_trace_blocks),
         which the Mosaic compiler maps to wide VPU/MXU work instead of a
         64-iteration scalar loop.
    A leaf re-tests its AABB against the updated per-lane best_t at flush
    time, so clusters queued early are still culled by hits found since.

Intersection semantics match accel/traverse.intersect_brute (u,v are the
e1/e2 barycentrics, tmin < t < tmax strict); the brute path remains the
correctness oracle in tests/test_stream_traverse.py.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = 3.4e38
# tile/cluster geometry (env-overridable for perf sweeps; the measured
# optimum on v5e city scenes is the default)
SUB = int(os.environ.get('HYDRA_STREAM_SUB', '8'))   # ray-plane sublanes
TILE = SUB * 128                                     # rays per grid program
TBK = int(os.environ.get('HYDRA_STREAM_TBK', '64'))  # tris per cluster
WPAD = -(-3 * TBK // 128) * 128   # padded 3*TBK Woop blocks, lane-aligned
QCAP = 512           # SMEM cluster queue capacity
# flush trigger: walk at most this many leaves before intersecting them.
# Small values tighten per-lane best_t EARLY so the rest of the walk is
# pruned by it (the walk otherwise runs with best_t = tmax and the only
# culling happens at flush re-test time); measured optimum on v5e city: 32.
FLUSH_N = int(os.environ.get('HYDRA_STREAM_FLUSH', '32'))
BIG_I = 0x7FFFFFF0


def _kernel(nodes_f_ref, nodes_i_ref, tris_hbm_ref, rays_ref,
            out_t_ref, out_tri_ref, out_u_ref, out_v_ref, *rest,
            any_hit: bool, with_stats: bool = False):
    if with_stats:
        nodes_out_ref, flush_out_ref, queue_ref, qnode_ref, buf_ref, \
            sem_ref = rest
    else:
        nodes_out_ref = flush_out_ref = None
        queue_ref, qnode_ref, buf_ref, sem_ref = rest
    px = rays_ref[0, 0]   # [SUB, 128]
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

    # dense-intersection ray rows [4, R] (R = TILE): the same broadcast-FMA
    # Woop layout as megakernel._trace_blocks
    R = TILE
    ones_r = jnp.ones((R,), jnp.float32)
    rhs_o = jnp.stack([px.reshape(R), py.reshape(R), pz.reshape(R), ones_r])
    rhs_d = jnp.stack([dx.reshape(R), dy.reshape(R), dz.reshape(R),
                       jnp.zeros((R,), jnp.float32)])
    tminw = tmin.reshape(1, R)

    def slab(node, best_t):
        """AABB test of the whole tile vs node (scalar bounds)."""
        bx0 = nodes_f_ref[node, 0]
        by0 = nodes_f_ref[node, 1]
        bz0 = nodes_f_ref[node, 2]
        bx1 = nodes_f_ref[node, 3]
        by1 = nodes_f_ref[node, 4]
        bz1 = nodes_f_ref[node, 5]
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
        return jnp.any(tn <= tf)

    # NOTE (r4 measured): a scalar frustum-interval walk (tile origin and
    # direction interval bounds, ~30 scalar ops/node, no vector work) was
    # tried here and LOST badly — per-lane best_t culling is what keeps the
    # visited-node set small, and the frustum's tile-max-t bound let the
    # shadow cluster count grow 25x (9.8 -> 2.9 Mrays/s).  The per-lane
    # slab + any() walk below is the measured optimum.

    def get_dma(slot, cluster):
        return pltpu.make_async_copy(
            tris_hbm_ref.at[cluster],      # [8, WPAD]
            buf_ref.at[slot],
            sem_ref.at[slot])

    hi = jax.lax.Precision.HIGHEST

    def intersect_cluster(slot, cslot, carry):
        """Dense [TBK, R] Woop intersection of the buffered cluster.

        The Woop transform is ONE MXU contraction per cluster: the buffered
        block is [4, 3*TBK] (rows = the 4 affine coefficients, lanes =
        x/y/z Woop row per triangle); contracting its row axis with the
        [4, R] ray rows yields [3*TBK, R] = (po|pd)_{x,y,z} stacked in
        sublane blocks of TBK — exactly the dense layout the elementwise
        tail needs, with no in-kernel transposes."""
        best_t, best_i, best_u, best_v = carry
        w = buf_ref[slot, 0:4]             # [4, WPAD] (rows 4:8 padding)
        dn = (((0,), (0,)), ((), ()))
        po = jax.lax.dot_general(w, rhs_o, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        pd = jax.lax.dot_general(w, rhs_d, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        po_x = po[0 * TBK:1 * TBK]
        po_y = po[1 * TBK:2 * TBK]
        po_z = po[2 * TBK:3 * TBK]
        pd_x = pd[0 * TBK:1 * TBK]
        pd_y = pd[1 * TBK:2 * TBK]
        pd_z = pd[2 * TBK:3 * TBK]
        t = -po_z / pd_z                    # padded rows: 0/0 -> nan -> reject
        u = po_x + t * pd_x
        v = po_y + t * pd_y
        valid = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tminw) & (t < best_t))
        if any_hit:
            # occlusion folds into (best_i, best_t): mark the lane and
            # collapse its interval so later slab tests cull it.  No i1
            # loop-carries (Mosaic cannot carry mask vectors).
            anyv = jnp.any(valid, axis=0, keepdims=True)
            best_i = jnp.where(anyv, 0, best_i)
            best_t = jnp.where(anyv, tminw, best_t)
            return best_t, best_i, best_u, best_v
        tm = jnp.where(valid, t, FLT_MAX)
        bt = jnp.min(tm, axis=0, keepdims=True)              # [1, R]
        ii = jax.lax.broadcasted_iota(jnp.int32, (TBK, R), 0)
        li = jnp.min(jnp.where(tm == bt, ii, BIG_I), axis=0, keepdims=True)
        oh = ((ii == li) & valid)
        ub = jnp.max(jnp.where(oh, u, -1.0), axis=0, keepdims=True)
        vb = jnp.max(jnp.where(oh, v, -1.0), axis=0, keepdims=True)
        closer = bt < best_t
        best_i = jnp.where(closer, cslot * TBK + li, best_i)
        best_u = jnp.where(closer, ub, best_u)
        best_v = jnp.where(closer, vb, best_v)
        best_t = jnp.minimum(best_t, bt)
        return best_t, best_i, best_u, best_v

    # occlusion wanted-mask: the caller marks lanes to trace with
    # tmax > tmin; a lane is "resolved" once occluded.  (Compare AFTER the
    # reshape — i1 vectors cannot be shape-cast on TPU.)
    want = tmax.reshape(1, R) > tmin.reshape(1, R)

    init = (jnp.int32(0),                                   # node
            tmax.reshape(1, R),                             # best_t [1,R]
            jnp.full((1, R), -1, jnp.int32),                # best tri
            jnp.zeros((1, R), jnp.float32),                 # u
            jnp.zeros((1, R), jnp.float32),
            jnp.int32(0),                                   # nodes walked
            jnp.int32(0))                                   # clusters flushed

    def outer_cond(state):
        return state[0] >= 0

    def outer_body(state):
        node, best_t, best_i, best_u, best_v, n_nodes, n_flush = state

        # ---- WALK: fill the SMEM cluster queue --------------------------
        bt_pl = best_t.reshape(SUB, 128)

        def w_cond(s):
            nd, qn, _ = s
            return (nd >= 0) & (qn < FLUSH_N)

        def w_body(s):
            nd, qn, steps = s
            hit = slab(nd, bt_pl)
            cslot = nodes_i_ref[nd, 1]
            skip = nodes_i_ref[nd, 0]
            is_leaf = cslot >= 0
            push = hit & is_leaf

            @pl.when(push)
            def _():
                queue_ref[qn] = cslot
                qnode_ref[qn] = nd

            descend = hit & ~is_leaf
            nxt = jnp.where(descend, nd + 1, skip)
            return nxt, qn + jnp.where(push, 1, 0), steps + 1

        node, qn, wsteps = jax.lax.while_loop(
            w_cond, w_body, (node, jnp.int32(0), jnp.int32(0)))
        n_nodes = n_nodes + wsteps
        n_flush = n_flush + qn

        # ---- FLUSH: double-buffered DMA + dense intersection ------------
        @pl.when(qn > 0)
        def _():
            get_dma(0, queue_ref[0]).start()

        def f_body(k, carry):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < qn)
            def _():
                get_dma(1 - slot, queue_ref[k + 1]).start()

            get_dma(slot, queue_ref[k]).wait()
            best_t = carry[0]
            # re-test this leaf's AABB against best_t as of NOW — hits found
            # since the walk queued it may cull it entirely
            live = slab(qnode_ref[k], best_t.reshape(SUB, 128))
            if any_hit:
                # also stop intersecting once every wanted lane is occluded
                live = live & jnp.any(want & (carry[1] < 0))
            return jax.lax.cond(
                live, lambda c: intersect_cluster(slot, queue_ref[k], c),
                lambda c: c, carry)

        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, qn, f_body, (best_t, best_i, best_u, best_v))

        if any_hit:
            done = ~jnp.any(want & (best_i < 0))
            node = jnp.where(done, jnp.int32(-1), node)
        return node, best_t, best_i, best_u, best_v, n_nodes, n_flush

    node, best_t, best_i, best_u, best_v, n_nodes, n_flush = \
        jax.lax.while_loop(outer_cond, outer_body, init)

    if nodes_out_ref is not None:
        nodes_out_ref[0] = jnp.full((SUB, 128), n_nodes, jnp.int32)
        flush_out_ref[0] = jnp.full((SUB, 128), n_flush, jnp.int32)

    # under any_hit, best_i >= 0 / best_t == tmin mark occluded lanes (the
    # same contract as traverse_pallas)
    out_t_ref[0] = best_t.reshape(SUB, 128)
    out_tri_ref[0] = best_i.reshape(SUB, 128)
    out_u_ref[0] = best_u.reshape(SUB, 128)
    out_v_ref[0] = best_v.reshape(SUB, 128)


@functools.partial(jax.jit, static_argnames=('any_hit', 'interpret',
                                             'with_stats'))
def intersect_stream(nodes_f, nodes_i, tris_hbm, ray_pos, ray_dir,
                     t_min, t_max, any_hit: bool = False,
                     interpret: bool = False, with_stats: bool = False):
    """Nearest-hit / any-hit over the streamed cluster BVH.

    nodes_f: [M, 8] f32 (bmin3, bmax3, pad2); nodes_i: [M, 4] i32 (skip,
    cluster_slot | -1, tri_count, pad); tris_hbm: [C, 8, WPAD] f32
    cluster-blocked Woop coefficient rows (HBM-resident; lane j of rows
    0..3 = the 4 affine coefficients of Woop row x/y/z for triangle
    j % TBK, block j // TBK).  Returns (t, tri, u, v) with tri = PADDED
    leaf-order triangle index (cluster_slot * TBK + k), -1 on miss; under
    any_hit, tri >= 0 flags occlusion.
    """
    N = ray_pos.shape[0]
    # clamp below the kernel's miss sentinel: with t_max >= FLT_MAX a
    # flushed cluster with NO valid intersection would register a false
    # 'hit' at the sentinel t (min over all-FLT_MAX rows compares < the
    # true float max the integrator passes)
    t_max = jnp.minimum(t_max, 0.99 * FLT_MAX)
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
    rays = rays.reshape(8, n_tiles, SUB, 128).transpose(1, 0, 2, 3)

    grid = (n_tiles,)
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
    ]
    tile_spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_specs = [tile_spec] * 4
    if with_stats:
        out_shape += [jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32)] * 2
        out_specs += [tile_spec] * 2
    outs = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit, with_stats=with_stats),
        grid=grid,
        in_specs=[
            pl.BlockSpec(nodes_f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes_i.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),         # tris stay in HBM
            pl.BlockSpec((1, 8, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.SMEM((QCAP,), jnp.int32),            # cluster queue
            pltpu.SMEM((QCAP,), jnp.int32),            # node id per entry
            pltpu.VMEM((2, 8, WPAD), jnp.float32),     # DMA double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(nodes_f, nodes_i, tris_hbm, rays)

    t, tri, u, v = [o.reshape(n_tiles * TILE)[:N] for o in outs[:4]]
    if with_stats:
        stats = jnp.stack([outs[4][:, 0, 0], outs[5][:, 0, 0]], axis=-1)
        return t, tri, u, v, stats
    return t, tri, u, v


def pack_stream_bvh(bvh, v0, e1, e2):
    """Host-side packing of a FlatBVH (max_leaf=TBK) into the streaming
    kernel's arrays.

    Returns (nodes_f [M,8] f32, nodes_i [M,4] i32, tris_hbm [C,8,WPAD]
    f32 — rows 0..3 hold the Woop coefficients, rows 4..7 are (8,128)-tile
    alignment padding — and order_padded [C*TBK] i64) where order_padded
    maps a PADDED
    leaf-order index to the original (pre-build) triangle index, -1 for
    padding rows.  v0/e1/e2 must already be in the builder's leaf order
    (i.e. indexed by bvh.order on the caller side).
    """
    M = len(bvh.bmin)
    leaf = bvh.tri_count > 0
    C = int(leaf.sum())
    nodes_f = np.zeros((M, 8), np.float32)
    nodes_f[:, 0:3] = bvh.bmin
    nodes_f[:, 3:6] = bvh.bmax
    nodes_i = np.zeros((M, 4), np.int32)
    nodes_i[:, 0] = bvh.skip
    nodes_i[:, 1] = -1
    nodes_i[leaf, 1] = np.arange(C, dtype=np.int32)
    nodes_i[:, 2] = bvh.tri_count

    # Woop rows per (leaf-ordered) triangle: M = inv([e1 e2 n] cols),
    # p = M (o - v0), q = M d; hit at p + t q = (u, v, 0).  Degenerate /
    # padded rows are all-zero -> q_z = 0 -> t = 0/0 = nan -> rejected.
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    T = len(v0)
    n = np.cross(e1, e2)
    A = np.stack([e1, e2, n], axis=-1)
    det = np.linalg.det(A)
    bad = np.abs(det) < 1e-18
    A[bad] = np.eye(3)
    Minv = np.linalg.inv(A)
    trans = -np.einsum('tij,tj->ti', Minv, v0)
    W = np.zeros((T, 3, 4), np.float32)
    W[:, :, :3] = Minv.astype(np.float32)
    W[:, :, 3] = trans.astype(np.float32)
    W[bad] = 0.0

    # 8 sublane rows (only 0..3 used): the (8,128) tile layout is then
    # native, avoiding a per-call relayout copy of the whole HBM operand
    # (measured ~31 ms FIXED per pallas_call at [C,4,WPAD] on v5e)
    tris_hbm = np.zeros((max(C, 1), 8, WPAD), np.float32)
    order_padded = np.full(max(C, 1) * TBK, -1, np.int64)
    offs = bvh.tri_offset[leaf]
    cnts = bvh.tri_count[leaf]
    for c in range(C):
        o, k = int(offs[c]), int(cnts[c])
        # [k, 3, 4] -> rows = coefficient, lanes = comp_block * TBK + tri
        blk = W[o:o + k].transpose(2, 1, 0)         # [4, 3, k]
        for comp in range(3):
            tris_hbm[c, 0:4, comp * TBK:comp * TBK + k] = blk[:, comp, :]
        order_padded[c * TBK:c * TBK + k] = np.arange(o, o + k)
    return nodes_f, nodes_i, tris_hbm, order_padded
