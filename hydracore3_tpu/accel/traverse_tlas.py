"""Pallas TPU streamed TWO-LEVEL traversal — instancing for big scenes.

The r4 streamed path (traverse_stream.py) flattens instances into a
world-space soup: O(instances x mesh) memory, and instanced scenes fell
back to the slow XLA two-level walk (VERDICT r4 missing #3).  This kernel
keeps each mesh's cluster blocks ONCE in HBM and walks a TLAS over
instance transforms in-kernel, matching the reference's BLAS/TLAS
contract (external/CrossRT/CrossRT.h:45-176, VulkanRTX TLAS; Embree
two-level in EmbreeRT.cpp):

  * per-MESH cluster BVHs packed exactly like pack_stream_bvh (object
    space), concatenated: node skip pointers globalized, -1 terminates a
    mesh walk; cluster slots globalized into one [C_total, 8, WPAD] HBM
    Woop array;
  * a TLAS skip-pointer BVH over instance world AABBs stays VMEM-resident
    (scalar walk, like the BVH node walk of traverse_stream);
  * on a TLAS leaf hit the tile's rays are transformed into object space
    by the instance's INVERSE matrix (12 scalar VMEM reads broadcast to
    lanes, ~30 VPU FMAs); the object-space direction is NOT renormalized,
    so the object-space t equals the world-space t and one per-lane
    best_t culls across instances;
  * the instance's mesh walk pushes leaf clusters into the same
    double-buffered DMA flush queue as the flat kernel; the winning
    (t, tri, u, v) carry gains a best_inst plane.

Returns PADDED leaf-order triangle ids (cluster_slot * TBK + k) exactly
like intersect_stream, plus the instance id; shading transforms the
object-space shade row by the instance normal matrix on the XLA side
(kernel_RayTrace2's normal-matrix step, integrator_pt.cpp:263-292).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import build_bvh
from .traverse_stream import SUB, TILE, TBK, WPAD, FLUSH_N, pack_stream_bvh

FLT_MAX = 3.4e38
BIG_I = 0x7FFFFFF0
QCAP = 256


def _kernel(tlas_f_ref, tlas_i_ref, nodes_f_ref, nodes_i_ref,
            inst_f_ref, inst_i_ref, tris_hbm_ref, rays_ref,
            out_t_ref, out_tri_ref, out_u_ref, out_v_ref, out_inst_ref,
            queue_ref, qnode_ref, buf_ref, sem_ref, *, any_hit: bool):
    px = rays_ref[0, 0]
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

    R = TILE
    tminw = tmin.reshape(1, R)
    want = tmax.reshape(1, R) > tminw

    def slab(nf_ref, node, ppx, ppy, ppz, iix, iiy, iiz, best_t):
        bx0 = nf_ref[node, 0]
        by0 = nf_ref[node, 1]
        bz0 = nf_ref[node, 2]
        bx1 = nf_ref[node, 3]
        by1 = nf_ref[node, 4]
        bz1 = nf_ref[node, 5]
        t0x = (bx0 - ppx) * iix
        t1x = (bx1 - ppx) * iix
        t0y = (by0 - ppy) * iiy
        t1y = (by1 - ppy) * iiy
        t0z = (bz0 - ppz) * iiz
        t1z = (bz1 - ppz) * iiz
        tn = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                     jnp.minimum(t0y, t1y)),
                         jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        tf = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                     jnp.maximum(t0y, t1y)),
                         jnp.minimum(jnp.maximum(t0z, t1z), best_t))
        return jnp.any(tn <= tf)

    def get_dma(slot, cluster):
        return pltpu.make_async_copy(
            tris_hbm_ref.at[cluster], buf_ref.at[slot], sem_ref.at[slot])

    hi = jax.lax.Precision.HIGHEST

    def intersect_cluster(slot, cslot, inst, rhs_o, rhs_d, carry):
        best_t, best_i, best_u, best_v, best_n = carry
        w = buf_ref[slot, 0:4]
        dn = (((0,), (0,)), ((), ()))
        po = jax.lax.dot_general(w, rhs_o, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        pd = jax.lax.dot_general(w, rhs_d, dn, precision=hi,
                                 preferred_element_type=jnp.float32)
        t = -po[2 * TBK:3 * TBK] / pd[2 * TBK:3 * TBK]
        u = po[0 * TBK:1 * TBK] + t * pd[0 * TBK:1 * TBK]
        v = po[1 * TBK:2 * TBK] + t * pd[1 * TBK:2 * TBK]
        valid = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tminw) & (t < best_t))
        if any_hit:
            anyv = jnp.any(valid, axis=0, keepdims=True)
            best_i = jnp.where(anyv, 0, best_i)
            best_t = jnp.where(anyv, tminw, best_t)
            return best_t, best_i, best_u, best_v, best_n
        tm = jnp.where(valid, t, FLT_MAX)
        bt = jnp.min(tm, axis=0, keepdims=True)
        ii = jax.lax.broadcasted_iota(jnp.int32, (TBK, R), 0)
        li = jnp.min(jnp.where(tm == bt, ii, BIG_I), axis=0, keepdims=True)
        oh = ((ii == li) & valid)
        ub = jnp.max(jnp.where(oh, u, -1.0), axis=0, keepdims=True)
        vb = jnp.max(jnp.where(oh, v, -1.0), axis=0, keepdims=True)
        closer = bt < best_t
        best_i = jnp.where(closer, cslot * TBK + li, best_i)
        best_u = jnp.where(closer, ub, best_u)
        best_v = jnp.where(closer, vb, best_v)
        best_n = jnp.where(closer, inst, best_n)
        best_t = jnp.minimum(best_t, bt)
        return best_t, best_i, best_u, best_v, best_n

    def enter_instance(inst, carry):
        """Walk one instance's object-space cluster BVH (same walk/flush
        discipline as traverse_stream._kernel, bounded to the mesh)."""
        # inverse world matrix rows (object = M^-1 * world)
        m = [inst_f_ref[inst, k] for k in range(12)]
        opx = m[0] * px + m[1] * py + m[2] * pz + m[3]
        opy = m[4] * px + m[5] * py + m[6] * pz + m[7]
        opz = m[8] * px + m[9] * py + m[10] * pz + m[11]
        odx = m[0] * dx + m[1] * dy + m[2] * dz
        ody = m[4] * dx + m[5] * dy + m[6] * dz
        odz = m[8] * dx + m[9] * dy + m[10] * dz
        oix = jnp.where(jnp.abs(odx) > 1e-20, 1.0 / odx, big)
        oiy = jnp.where(jnp.abs(ody) > 1e-20, 1.0 / ody, big)
        oiz = jnp.where(jnp.abs(odz) > 1e-20, 1.0 / odz, big)
        ones_r = jnp.ones((R,), jnp.float32)
        rhs_o = jnp.stack([opx.reshape(R), opy.reshape(R), opz.reshape(R),
                           ones_r])
        rhs_d = jnp.stack([odx.reshape(R), ody.reshape(R), odz.reshape(R),
                           jnp.zeros((R,), jnp.float32)])

        def o_cond(s):
            return s[0] >= 0

        def o_body(s):
            node, best = s

            def w_cond(ws):
                nd, qn = ws
                return (nd >= 0) & (qn < FLUSH_N)

            def w_body(ws):
                nd, qn = ws
                hit = slab(nodes_f_ref, nd, opx, opy, opz, oix, oiy, oiz,
                           best[0].reshape(SUB, 128))
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
                return nxt, qn + jnp.where(push, 1, 0)

            node, qn = jax.lax.while_loop(w_cond, w_body,
                                          (node, jnp.int32(0)))

            @pl.when(qn > 0)
            def _():
                get_dma(0, queue_ref[0]).start()

            def f_body(k, c):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < qn)
                def _():
                    get_dma(1 - slot, queue_ref[k + 1]).start()

                get_dma(slot, queue_ref[k]).wait()
                live = slab(nodes_f_ref, qnode_ref[k], opx, opy, opz,
                            oix, oiy, oiz, c[0].reshape(SUB, 128))
                if any_hit:
                    live = live & jnp.any(want & (c[1] < 0))
                return jax.lax.cond(
                    live,
                    lambda cc: intersect_cluster(slot, queue_ref[k], inst,
                                                 rhs_o, rhs_d, cc),
                    lambda cc: cc, c)

            best = jax.lax.fori_loop(0, qn, f_body, best)
            return node, best

        node0 = inst_i_ref[inst, 0]
        _, carry = jax.lax.while_loop(o_cond, o_body, (node0, carry))
        return carry

    init_best = (tmax.reshape(1, R),
                 jnp.full((1, R), -1, jnp.int32),
                 jnp.zeros((1, R), jnp.float32),
                 jnp.zeros((1, R), jnp.float32),
                 jnp.full((1, R), -1, jnp.int32))

    def t_cond(s):
        done = False
        if any_hit:
            pass
        return s[0] >= 0

    def t_body(s):
        tnode, best = s[0], s[1:]
        hit = slab(tlas_f_ref, tnode, px, py, pz, ix, iy, iz,
                   best[0].reshape(SUB, 128))
        inst = tlas_i_ref[tnode, 1]
        skip = tlas_i_ref[tnode, 0]
        is_leaf = inst >= 0
        best = jax.lax.cond(hit & is_leaf,
                            lambda c: enter_instance(inst, c),
                            lambda c: c, best)
        if any_hit:
            done = ~jnp.any(want & (best[1] < 0))
        else:
            done = False
        nxt = jnp.where(hit & ~is_leaf, tnode + 1, skip)
        if any_hit:
            nxt = jnp.where(done, jnp.int32(-1), nxt)
        return (nxt,) + best

    out = jax.lax.while_loop(t_cond, t_body, (jnp.int32(0),) + init_best)
    _, best_t, best_i, best_u, best_v, best_n = out

    out_t_ref[0] = best_t.reshape(SUB, 128)
    out_tri_ref[0] = best_i.reshape(SUB, 128)
    out_u_ref[0] = best_u.reshape(SUB, 128)
    out_v_ref[0] = best_v.reshape(SUB, 128)
    out_inst_ref[0] = best_n.reshape(SUB, 128)


@functools.partial(jax.jit, static_argnames=('any_hit', 'interpret'))
def intersect_stream_tlas(tlas_f, tlas_i, nodes_f, nodes_i, inst_f, inst_i,
                          tris_hbm, ray_pos, ray_dir, t_min, t_max,
                          any_hit: bool = False, interpret: bool = False):
    """Two-level nearest-hit / any-hit over per-mesh streamed cluster BVHs.

    Returns (t, tri, u, v, inst): tri = GLOBAL padded leaf-order triangle
    index, inst = winning instance id (-1 on miss); under any_hit tri >= 0
    flags occlusion.  u/v are OBJECT-space barycentrics (invariant under
    the instance transform)."""
    N = ray_pos.shape[0]
    # below the miss sentinel (see traverse_stream.intersect_stream)
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
                      t_min, t_max], axis=0)
    rays = rays.reshape(8, n_tiles, SUB, 128).transpose(1, 0, 2, 3)
    tile_spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(tlas_f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tlas_i.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes_f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(nodes_i.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(inst_f.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(inst_i.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec] * 5,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((QCAP,), jnp.int32),
            pltpu.SMEM((QCAP,), jnp.int32),
            pltpu.VMEM((2, 8, WPAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tlas_f, tlas_i, nodes_f, nodes_i, inst_f, inst_i, tris_hbm, rays)
    t, tri, u, v, inst = [o.reshape(n_tiles * TILE)[:N] for o in outs]
    return t, tri, u, v, inst


def pack_stream_tlas(mesh_tris: list, instances: list):
    """Host-side packing for the two-level streamed kernel.

    mesh_tris: per mesh (v0 [N,3], e1, e2) in OBJECT space.
    instances: list of dicts {geom_id, m0 [4,4]} (static transforms; the
    motion path stays on the XLA two-level walk).

    Returns dict with: tlas_f [Mt,8] f32, tlas_i [Mt,4] i32 (skip,
    inst|-1), nodes_f/nodes_i (concatenated per-mesh stream nodes, skip
    globalized / -1 ends a mesh), inst_f [I,16] f32 (12 inverse-matrix
    entries), inst_i [I,4] i32 (blas node base, geom id), tris_hbm
    [C,8,WPAD], order_padded [C*TBK] (padded leaf slot -> mesh-LOCAL
    leaf-order triangle), tri_mesh [C*TBK] (mesh id per padded slot, -1
    pad), node_base [G], tri_base [G] (mesh-local leaf-order offsets into
    per-mesh soups)."""
    nodes_f_l, nodes_i_l, tris_l, order_l, mesh_l = [], [], [], [], []
    node_base, cluster_base = [], []
    mesh_bounds = []
    nbase = 0
    cbase = 0
    for g, (v0, e1, e2) in enumerate(mesh_tris):
        b = build_bvh.build(np.asarray(v0, np.float32),
                            np.asarray(e1, np.float32),
                            np.asarray(e2, np.float32), max_leaf=TBK)
        order = b.order
        nf, ni, th, op = pack_stream_bvh(
            b, np.asarray(v0, np.float32)[order],
            np.asarray(e1, np.float32)[order],
            np.asarray(e2, np.float32)[order])
        ni = ni.copy()
        sk = ni[:, 0]
        sk[sk >= 0] += nbase                       # globalize skip
        leaf = ni[:, 1] >= 0
        ni[leaf, 1] += cbase                       # globalize cluster slot
        node_base.append(nbase)
        cluster_base.append(cbase)
        nodes_f_l.append(nf)
        nodes_i_l.append(ni)
        tris_l.append(th)
        # padded slot -> ORIGINAL mesh-local primitive id (compose the
        # leaf-order padding map with the builder's sort order)
        op = np.where(op >= 0, order[np.maximum(op, 0)], -1)
        order_l.append(op)
        mesh_l.append(np.where(op >= 0, g, -1))
        mesh_bounds.append((b.bmin[0] if len(b.bmin) else np.zeros(3),
                            b.bmax[0] if len(b.bmax) else np.zeros(3)))
        nbase += len(nf)
        cbase += len(th)

    inst_bmin, inst_bmax, inst_f, inst_i = [], [], [], []
    inst_nm = []
    for inst in instances:
        g = inst['geom_id']
        m0 = np.asarray(inst['m0'], np.float64).reshape(4, 4)
        bmn, bmx = mesh_bounds[g]
        corners = np.array([[bmn[0] if i & 1 == 0 else bmx[0],
                             bmn[1] if i & 2 == 0 else bmx[1],
                             bmn[2] if i & 4 == 0 else bmx[2]]
                            for i in range(8)], np.float64)
        w = corners @ m0[:3, :3].T + m0[:3, 3]
        inst_bmin.append(w.min(0).astype(np.float32))
        inst_bmax.append(w.max(0).astype(np.float32))
        mi = np.linalg.inv(m0)
        row = np.zeros(16, np.float32)
        row[:12] = mi[:3, :].reshape(12).astype(np.float32)
        inst_f.append(row)
        inst_i.append([node_base[g], g, 0, 0])
        inst_nm.append(np.linalg.inv(m0).T.astype(np.float32).reshape(16))

    tl = build_bvh.build_from_aabbs(np.array(inst_bmin, np.float32),
                                    np.array(inst_bmax, np.float32),
                                    max_leaf=1)
    Mt = len(tl.bmin)
    tlas_f = np.zeros((Mt, 8), np.float32)
    tlas_f[:, 0:3] = tl.bmin
    tlas_f[:, 3:6] = tl.bmax
    tlas_i = np.zeros((Mt, 4), np.int32)
    tlas_i[:, 0] = tl.skip
    tlas_i[:, 1] = -1
    leaf = tl.tri_count > 0
    tlas_i[leaf, 1] = tl.order[tl.tri_offset[leaf]]

    return dict(
        tlas_f=tlas_f, tlas_i=tlas_i,
        nodes_f=np.concatenate(nodes_f_l),
        nodes_i=np.concatenate(nodes_i_l),
        inst_f=np.array(inst_f, np.float32),
        inst_i=np.array(inst_i, np.int32),
        inst_nm=np.array(inst_nm, np.float32),
        tris_hbm=np.concatenate(tris_l),
        order_padded=np.concatenate(order_l),
        tri_mesh=np.concatenate(mesh_l),
        node_base=np.array(node_base, np.int32),
        cluster_base=np.array(cluster_base, np.int32))
