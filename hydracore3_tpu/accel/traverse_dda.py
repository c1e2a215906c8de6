"""Grid-DDA wavefront traversal — the INCOHERENT-ray path for big scenes.

The streamed BVH kernel (traverse_stream.py) walks one shared BVH cut per
[SUB,128]-ray tile, so a tile pays rays_in_tile x UNION(clusters) — near
optimal for coherent camera/shadow packets, but 5-10x wasteful for diffuse
bounce rays even after octant/Morton sorting (measured on the 215k-tri
city, docs/PERF_NOTES.md r4).  This module replaces the per-tile walk with
GLOBAL rebinning, the TPU-native form of wavefront traversal
(kmake_wave.json:11 is the reference's wavefront build):

  * scene clusters (the same [C, 4, WPAD] Woop blocks the streamed kernel
    uses) are binned into a uniform grid over the scene AABB at build time;
  * rays march the grid with a 3D-DDA — the cell index and exit-t are pure
    vector math in XLA (no gathers);
  * each round, rays are argsorted by current cell id, so every [SUB,128]
    tile holds rays wanting the SAME few cells; the Pallas kernel
    intersects each tile against its (<= CELL_CAP distinct) cells' cluster
    lists densely, with per-lane best-t culling and double-buffered HBM
    cluster DMA;
  * a ray terminates when its best hit lies inside the traversed prefix
    (front-to-back correctness), when it leaves the grid (miss), or — in
    any-hit mode — at the first occluder.

Sorting costs ~0.5 ms per 32k rays per round (argsort + state gather);
rays typically resolve in 2-6 rounds on sponza-class scenes.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .traverse_stream import SUB, TILE, TBK, WPAD

FLT_MAX = 3.4e38
BIG_I = 0x7FFFFFF0
CELL_CAP = 4        # max distinct cells processed per tile per round
QCAP = 256          # cluster queue per tile per round


@dataclasses.dataclass(frozen=True)
class GridPack:
    """Device tables for the DDA tracer (static geometry per scene)."""
    cell_tab: jnp.ndarray    # [NC, 4] i32: (cluster_offset, count, skip_r, 0)
    cell_cl: jnp.ndarray     # [K, 4] i32: cluster slot per entry
    cl_aabb: jnp.ndarray     # [C, 8] f32: per-cluster AABB (re-test cull)
    # outlier clusters (outside the dense-grid AABB, e.g. a far overhead
    # area light): tested ONCE per tile before the march
    outliers: jnp.ndarray    # [O, 4] i32 cluster slots (>= 1 row)
    n_outliers: int          # static
    lo: tuple                # grid origin (3 floats, static)
    h: tuple                 # cell size (3 floats, static)
    dims: tuple              # cells per axis (3 ints, static)


jax.tree_util.register_dataclass(
    GridPack, data_fields=['cell_tab', 'cell_cl', 'cl_aabb', 'outliers'],
    meta_fields=['n_outliers', 'lo', 'h', 'dims'])


def pack_grid(nodes_f: np.ndarray, nodes_i: np.ndarray,
              target_clusters_per_cell: float = None,
              max_dim: int = 64, robust_aabb: bool = True) -> GridPack:
    """Bin the stream-BVH's leaf clusters into a uniform grid.

    nodes_f/nodes_i are pack_stream_bvh outputs; leaf rows carry the
    cluster AABB and slot."""
    if target_clusters_per_cell is None:
        target_clusters_per_cell = float(
            os.environ.get('HYDRA_GRID_TCPC', '8'))
    leaf = nodes_i[:, 1] >= 0
    lo3 = nodes_f[leaf, 0:3]
    hi3 = nodes_f[leaf, 3:6]
    slot = nodes_i[leaf, 1]
    C = int(slot.max()) + 1 if len(slot) else 1
    cl_aabb = np.zeros((max(C, 1), 8), np.float32)
    cl_aabb[slot, 0:3] = lo3
    cl_aabb[slot, 3:6] = hi3

    # dense-grid AABB from a robust (percentile-expanded) bound: far-flung
    # isolated geometry (the classic case: an overhead area light) would
    # otherwise stretch the grid and squeeze the empty-skip radii between
    # occupied layers, making horizon rays crawl cell by cell.  Clusters
    # outside the dense AABB go to the per-tile outlier list.
    MAX_OUTLIERS = 32
    ctr = 0.5 * (lo3 + hi3)
    p_lo = np.percentile(ctr, 2, axis=0)
    p_hi = np.percentile(ctr, 98, axis=0)
    span = np.maximum(p_hi - p_lo, 1e-3)
    r_lo = p_lo - 0.35 * span
    r_hi = p_hi + 0.35 * span
    out_mask = ((ctr < r_lo) | (ctr > r_hi)).any(axis=1)
    if not robust_aabb or out_mask.sum() > MAX_OUTLIERS:
        out_mask[:] = False          # too many: use the full AABB
    inl = ~out_mask
    outlier_slots = slot[out_mask]
    lo3_g = lo3[inl] if inl.any() else lo3
    hi3_g = hi3[inl] if inl.any() else hi3

    glo = lo3_g.min(axis=0) - 1e-3
    ghi = hi3_g.max(axis=0) + 1e-3
    ext = np.maximum(ghi - glo, 1e-3)
    # cell volume targeting ~target clusters per cell, clamped per axis.
    # r5 sweep (city, captured bounce-2 rays): 8 clusters/cell beats the
    # r4 default of 3 by 28-46% — fewer rounds and smaller per-tile cell
    # unions outweigh the extra slab-culled clusters per flush.
    n_cells = max(int(C / target_clusters_per_cell), 8)
    hsz = float((ext.prod() / n_cells) ** (1.0 / 3.0))
    dims = np.clip(np.ceil(ext / hsz).astype(np.int64), 1, max_dim)
    h = ext / dims

    ix0 = np.clip(((lo3 - glo) / h).astype(np.int64), 0, dims - 1)
    ix1 = np.clip(((hi3 - glo) / h).astype(np.int64), 0, dims - 1)
    cells: list[list[int]] = [[] for _ in range(int(dims.prod()))]
    dy = int(dims[2])
    dxy = int(dims[1] * dims[2])
    for c in range(len(slot)):
        if out_mask[c]:
            continue
        for x in range(ix0[c, 0], ix1[c, 0] + 1):
            for y in range(ix0[c, 1], ix1[c, 1] + 1):
                for z in range(ix0[c, 2], ix1[c, 2] + 1):
                    cells[x * dxy + y * dy + z].append(int(slot[c]))
    NC = len(cells)
    cell_tab = np.zeros((NC, 4), np.int32)
    flat: list[int] = []
    for i, cl in enumerate(cells):
        cell_tab[i, 0] = len(flat)
        cell_tab[i, 1] = len(cl)
        flat.extend(cl)
    # proximity clouds (empty-space skipping): cell_tab[:,2] = chebyshev
    # distance to the nearest OCCUPIED cell, capped.  The march jumps
    # (r-1)*min_a(h_a/|d_a|) through empty regions in one iteration —
    # without this, rays over the rooftops crawl cell by cell (measured
    # 59 ms/32k camera rays on the city because the scene AABB extends up
    # to the area light).
    R_CAP = 15
    occ = (cell_tab[:, 1] > 0).reshape(tuple(int(v) for v in dims))
    dist = np.where(occ, 0, R_CAP).astype(np.int32)
    for _ in range(R_CAP):
        d2 = dist.copy()
        # chebyshev erosion: min over the 26-neighborhood + 1
        p = np.pad(dist, 1, constant_values=R_CAP)
        view = np.stack([p[1 + dx_:1 + dx_ + dist.shape[0],
                           1 + dy_:1 + dy_ + dist.shape[1],
                           1 + dz2:1 + dz2 + dist.shape[2]]
                         for dx_ in (-1, 0, 1) for dy_ in (-1, 0, 1)
                         for dz2 in (-1, 0, 1)])
        d2 = np.minimum(d2, view.min(axis=0) + 1)
        if (d2 == dist).all():
            break
        dist = d2
    cell_tab[:, 2] = dist.reshape(-1)
    max_cell = int(cell_tab[:, 1].max(initial=0))
    if max_cell > QCAP:
        raise ValueError(
            f'cell with {max_cell} clusters exceeds QCAP={QCAP}; raise the '
            f'grid resolution (scene extent degenerate?)')
    cell_cl = np.zeros((max(len(flat), 1), 4), np.int32)
    cell_cl[:len(flat), 0] = flat
    n_out = int(len(outlier_slots))
    outliers = np.zeros((max(n_out, 1), 4), np.int32)
    outliers[:n_out, 0] = outlier_slots
    return GridPack(cell_tab=jnp.asarray(cell_tab),
                    cell_cl=jnp.asarray(cell_cl),
                    cl_aabb=jnp.asarray(cl_aabb),
                    outliers=jnp.asarray(outliers), n_outliers=n_out,
                    lo=tuple(float(v) for v in glo),
                    h=tuple(float(v) for v in h),
                    dims=tuple(int(v) for v in dims))


def _cell_kernel(cell_tab_ref, cell_cl_ref, cl_aabb_ref, tris_hbm_ref,
                 rays_ref, cell_ref, bestin_ref, ibest_ref,
                 out_t_ref, out_tri_ref, out_u_ref, out_v_ref, out_pr_ref,
                 queue_ref, buf_ref, sem_ref, *, any_hit: bool):
    """Per-tile: intersect lanes against the clusters of up to CELL_CAP
    distinct lane-cells (tile is cell-sorted, so usually 1-2)."""
    px = rays_ref[0, 0]
    py = rays_ref[0, 1]
    pz = rays_ref[0, 2]
    dx = rays_ref[0, 3]
    dy = rays_ref[0, 4]
    dz = rays_ref[0, 5]
    tmin = rays_ref[0, 6]

    big = jnp.float32(1e30)
    ix = jnp.where(jnp.abs(dx) > 1e-20, 1.0 / dx, big)
    iy = jnp.where(jnp.abs(dy) > 1e-20, 1.0 / dy, big)
    iz = jnp.where(jnp.abs(dz) > 1e-20, 1.0 / dz, big)

    R = TILE
    ones_r = jnp.ones((R,), jnp.float32)
    rhs_o = jnp.stack([px.reshape(R), py.reshape(R), pz.reshape(R), ones_r])
    rhs_d = jnp.stack([dx.reshape(R), dy.reshape(R), dz.reshape(R),
                       jnp.zeros((R,), jnp.float32)])
    tminw = tmin.reshape(1, R)

    cell = cell_ref[0, 0]                   # [SUB, 128] i32 (BIG_I = idle)

    def slab_cluster(cslot, best_t):
        """Tile-vs-cluster-AABB re-test with current best_t."""
        bx0 = cl_aabb_ref[cslot, 0]
        by0 = cl_aabb_ref[cslot, 1]
        bz0 = cl_aabb_ref[cslot, 2]
        bx1 = cl_aabb_ref[cslot, 3]
        by1 = cl_aabb_ref[cslot, 4]
        bz1 = cl_aabb_ref[cslot, 5]
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

    def get_dma(slot, cluster):
        return pltpu.make_async_copy(
            tris_hbm_ref.at[cluster], buf_ref.at[slot], sem_ref.at[slot])

    hi = jax.lax.Precision.HIGHEST

    def intersect_cluster(slot, cslot, carry):
        best_t, best_i, best_u, best_v = carry
        w = buf_ref[slot, 0:4]
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
        t = -po_z / pd_z
        u = po_x + t * pd_x
        v = po_y + t * pd_y
        valid = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                 & (t > tminw) & (t < best_t))
        if any_hit:
            anyv = jnp.any(valid, axis=0, keepdims=True)
            best_i = jnp.where(anyv, 0, best_i)
            best_t = jnp.where(anyv, tminw, best_t)
            return best_t, best_i, best_u, best_v
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
        best_t = jnp.minimum(best_t, bt)
        return best_t, best_i, best_u, best_v

    # ---- collect the tile's distinct cells (ascending) -------------------
    # and their cluster lists into the queue
    processed = jnp.zeros((SUB, 128), jnp.int32)

    def collect(cap_i, carry):
        qn, cur_min, processed = carry
        # cur_min: smallest unprocessed cell id in the tile (BIG_I if none)
        valid_cell = cur_min < BIG_I

        def add(args):
            qn, processed = args
            off = cell_tab_ref[cur_min, 0]
            cnt = cell_tab_ref[cur_min, 1]
            # a cell is taken whole or not at all — truncating its cluster
            # list would silently drop geometry (lanes stay unprocessed
            # and retry next round instead)
            fits = qn + cnt <= QCAP

            def do(args):
                qn, processed = args

                def push(j, q):
                    queue_ref[q] = cell_cl_ref[off + j, 0]
                    return q + 1

                qn = jax.lax.fori_loop(0, cnt, push, qn)
                processed = processed | (cell == cur_min).astype(jnp.int32)
                return qn, processed

            return jax.lax.cond(fits, do, lambda a: a, (qn, processed))

        qn, processed = jax.lax.cond(valid_cell, add,
                                     lambda a: a, (qn, processed))
        nxt = jnp.min(jnp.where(cell > cur_min, cell, BIG_I))
        return qn, nxt, processed

    first = jnp.min(cell)
    qn, _, processed = jax.lax.fori_loop(
        0, CELL_CAP, collect, (jnp.int32(0), first, processed))

    # ---- flush the cluster queue with double-buffered DMA ----------------
    best = (bestin_ref[0, 0][None].reshape(1, R),        # best_t plane
            ibest_ref[0, 0][None].reshape(1, R),         # best_i plane
            bestin_ref[0, 1][None].reshape(1, R),        # u
            bestin_ref[0, 2][None].reshape(1, R))        # v

    @pl.when(qn > 0)
    def _():
        get_dma(0, queue_ref[0]).start()

    def f_body(k, carry):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < qn)
        def _():
            get_dma(1 - slot, queue_ref[k + 1]).start()

        get_dma(slot, queue_ref[k]).wait()
        live = slab_cluster(queue_ref[k], carry[0].reshape(SUB, 128))
        return jax.lax.cond(
            live, lambda c: intersect_cluster(slot, queue_ref[k], c),
            lambda c: c, carry)

    best_t, best_i, best_u, best_v = jax.lax.fori_loop(0, qn, f_body, best)

    out_t_ref[0] = best_t.reshape(SUB, 128)
    out_tri_ref[0] = best_i.reshape(SUB, 128)
    out_u_ref[0] = best_u.reshape(SUB, 128)
    out_v_ref[0] = best_v.reshape(SUB, 128)
    out_pr_ref[0] = processed


def _cell_pass(grid: GridPack, tris_hbm, rays, cell, best_t, best_i,
               best_u, best_v, any_hit: bool, interpret: bool):
    """One Pallas round over cell-sorted rays.  All arrays pre-tiled:
    rays [n_tiles, 8, SUB, 128]; cell/best* [n_tiles, SUB, 128]."""
    n_tiles = rays.shape[0]
    tile_spec = pl.BlockSpec((1, SUB, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    bestin = jnp.stack([best_t, best_u, best_v], axis=1)  # [nt, 3, SUB, 128]
    ibest = best_i[:, None]                               # [nt, 1, SUB, 128]
    outs = pl.pallas_call(
        functools.partial(_cell_kernel, any_hit=any_hit),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(grid.cell_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(grid.cell_cl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(grid.cl_aabb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUB, 128), lambda i: (i, 0, 0, 0),
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
            pltpu.VMEM((2, 8, WPAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(grid.cell_tab, grid.cell_cl, grid.cl_aabb, tris_hbm,
      rays, cell[:, None], bestin, ibest)
    return outs


@functools.partial(jax.jit, static_argnames=('grid_lo', 'grid_h',
                                             'grid_dims', 'any_hit',
                                             'interpret', 'max_rounds'))
def _trace_dda_impl(cell_tab, cell_cl, cl_aabb, tris_hbm,
                    ray_pos, ray_dir, t_min, t_max,
                    grid_lo, grid_h, grid_dims,
                    any_hit: bool, interpret: bool, max_rounds: int):
    N = ray_pos.shape[0]
    t_max = jnp.minimum(t_max, 0.99 * FLT_MAX)
    n_tiles = -(-N // TILE)
    pad = n_tiles * TILE - N
    if pad:
        ray_pos = jnp.concatenate([ray_pos, jnp.zeros((pad, 3), jnp.float32)])
        ray_dir = jnp.concatenate([ray_dir, jnp.ones((pad, 3), jnp.float32)])
        t_min = jnp.concatenate([t_min, jnp.zeros((pad,), jnp.float32)])
        t_max = jnp.concatenate([t_max, jnp.zeros((pad,), jnp.float32)])
    Np = n_tiles * TILE
    grid = GridPack(cell_tab=cell_tab, cell_cl=cell_cl, cl_aabb=cl_aabb,
                    outliers=jnp.zeros((1, 4), jnp.int32), n_outliers=0,
                    lo=grid_lo, h=grid_h, dims=grid_dims)

    lo = jnp.asarray(grid_lo, jnp.float32)
    h = jnp.asarray(grid_h, jnp.float32)
    dims = jnp.asarray(grid_dims, jnp.int32)
    dxy = grid_dims[1] * grid_dims[2]
    dz_ = grid_dims[2]
    eps = 1e-4 * float(min(grid_h))

    inv_d = jnp.where(jnp.abs(ray_dir) > 1e-20, 1.0 / ray_dir, 1e30)
    # grid-box entry param
    t0 = (lo[None] - ray_pos) * inv_d
    t1 = (lo[None] + h[None] * dims[None].astype(jnp.float32)
          - ray_pos) * inv_d
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_enter = jnp.maximum(tn, t_min)
    miss_box = (tn > tf) | (tf < t_min)

    def round_body(carry):
        (t_cur, best_t, best_i, best_u, best_v, done, orig, rnd) = carry
        # cell + exit-t from current march position (pure vector math)
        p = ray_pos_s(orig) + ray_dir_s(orig) * (t_cur + eps)[:, None]
        q = jnp.floor((p - lo[None]) / h[None]).astype(jnp.int32)
        inside = jnp.all((q >= 0) & (q < dims[None]), axis=-1)
        qc = jnp.clip(q, 0, dims[None] - 1)
        cell = qc[:, 0] * dxy + qc[:, 1] * dz_ + qc[:, 2]
        d = ray_dir_s(orig)
        ivd = jnp.where(jnp.abs(d) > 1e-20, 1.0 / d, 1e30)
        nxt_b = lo[None] + (qc + (d > 0)).astype(jnp.float32) * h[None]
        t_exit = jnp.min(jnp.where(jnp.abs(d) > 1e-20,
                                   (nxt_b - ray_pos_s(orig)) * ivd, 1e30),
                         axis=-1)
        live = ~done & inside
        key = jnp.where(live, cell, jnp.int32(BIG_I))
        perm = jnp.argsort(key)
        orig = orig[perm]
        t_cur = t_cur[perm]
        best_t = best_t[perm]
        best_i = best_i[perm]
        best_u = best_u[perm]
        best_v = best_v[perm]
        done = done[perm]
        live = live[perm]
        # `inside` must ride the permutation too: it is read again below to
        # mark grid-exited lanes done (a staggered-exit scene otherwise
        # marks the WRONG lanes done and silently drops their hits)
        inside = inside[perm]
        cell = key[perm]
        t_exit = t_exit[perm]

        rp = ray_pos_s(orig)
        rd = ray_dir_s(orig)
        rays = jnp.stack([rp[:, 0], rp[:, 1], rp[:, 2],
                          rd[:, 0], rd[:, 1], rd[:, 2],
                          t_min[orig], t_max[orig]], axis=0)
        rays = rays.reshape(8, n_tiles, SUB, 128).transpose(1, 0, 2, 3)

        def tile3(x):
            return x.reshape(n_tiles, SUB, 128)

        bt, bi, bu, bv, pr = _cell_pass(
            grid, tris_hbm, rays, tile3(cell), tile3(best_t),
            tile3(best_i), tile3(best_u), tile3(best_v),
            any_hit, interpret)
        best_t = bt.reshape(Np)
        best_i = bi.reshape(Np)
        best_u = bu.reshape(Np)
        best_v = bv.reshape(Np)
        pr = pr.reshape(Np) != 0

        advanced = live & pr
        if any_hit:
            done = done | ~inside | (best_i >= 0)
        else:
            done = done | ~inside | (advanced & (best_t <= t_exit))
        t_cur = jnp.where(advanced & ~done, t_exit, t_cur)
        done = done | (t_cur >= t_max[orig])
        return (t_cur, best_t, best_i, best_u, best_v, done, orig,
                rnd + 1)

    def round_cond(carry):
        done = carry[5]
        rnd = carry[7]
        return (rnd < max_rounds) & jnp.any(~done)

    def ray_pos_s(orig):
        return ray_pos[orig]

    def ray_dir_s(orig):
        return ray_dir[orig]

    orig0 = jnp.arange(Np, dtype=jnp.int32)
    init = (t_enter,
            t_max,
            jnp.full((Np,), -1, jnp.int32),
            jnp.zeros((Np,), jnp.float32),
            jnp.zeros((Np,), jnp.float32),
            miss_box | (t_max <= t_min),
            orig0,
            jnp.int32(0))
    t_cur, best_t, best_i, best_u, best_v, done, orig, _ = \
        jax.lax.while_loop(round_cond, round_body, init)

    inv = jnp.argsort(orig)
    best_t = best_t[inv][:N]
    best_i = best_i[inv][:N]
    best_u = best_u[inv][:N]
    best_v = best_v[inv][:N]
    return best_t, best_i, best_u, best_v


def intersect_dda(grid: GridPack, tris_hbm, ray_pos, ray_dir, t_min, t_max,
                  any_hit: bool = False, interpret: bool = False,
                  max_rounds: int = 48):
    """Nearest-hit / any-hit via grid-DDA wavefront rebinning.

    Same output contract as traverse_stream.intersect_stream: (t, tri, u,
    v), tri = padded leaf-order index or -1; any_hit flags occlusion with
    tri >= 0."""
    assert grid.n_outliers == 0, (
        'the archived v1 rebinning driver has no outlier pass; build the '
        'grid with robust_aabb=False for it')
    return _trace_dda_impl(grid.cell_tab, grid.cell_cl, grid.cl_aabb,
                           tris_hbm, ray_pos, ray_dir, t_min, t_max,
                           grid.lo, grid.h, grid.dims,
                           any_hit, interpret, max_rounds)


# ===========================================================================
# v2: in-kernel marching (sort-free after the integrator's per-bounce
# octant/Morton sort).  The v1 per-round XLA rebinning loses to its own
# argsort+gather overhead (docs/PERF_NOTES.md r4); v2 keeps the whole march
# inside one kernel: cell ids and exit-t are per-lane VECTOR math, the
# tile processes the union of its lanes' current cells per step (small for
# Morton-sorted tiles), and there is NO per-node scalar walk at all — the
# BVH's weakness was 0.6 us per node-step, dominated by scalar loads and
# the cross-lane any() reduce.
# ===========================================================================

MARCH_MAX = 192     # hard cap on in-kernel march iterations (safety)
# per-round cell collection: iterate up to CELL_ITER distinct cells but
# stop pushing once FLUSH_BUDGET clusters are queued.  Empty cells cost one
# scalar iteration and no flush, so direction-diverged tiles (deep-bounce
# rays) advance MANY lanes per round instead of stalling on a 4-cell cap —
# the r4 CELL_CAP=4 starvation was the measured bounce>=2 wall (0.3 Mrays/s
# while bounce 0 ran 10.9).
CELL_ITER = int(os.environ.get('HYDRA_MARCH_CELLS', '24'))
FLUSH_BUDGET = int(os.environ.get('HYDRA_MARCH_FLUSH', '12'))


def _march_kernel(cell_tab_ref, cell_cl_ref, cl_aabb_ref, outliers_ref,
                  tris_hbm_ref,
                  rays_ref, out_t_ref, out_tri_ref, out_u_ref, out_v_ref,
                  out_un_ref, *rest, any_hit: bool,
                  n_outliers: int, lo: tuple, h: tuple, dims: tuple,
                  march_max: int, with_stats: bool = False):
    if with_stats:
        it_out_ref, fl_out_ref, queue_ref, buf_ref, sem_ref = rest
    else:
        it_out_ref = fl_out_ref = None
        queue_ref, buf_ref, sem_ref = rest
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
    ones_r = jnp.ones((R,), jnp.float32)
    rhs_o = jnp.stack([px.reshape(R), py.reshape(R), pz.reshape(R), ones_r])
    rhs_d = jnp.stack([dx.reshape(R), dy.reshape(R), dz.reshape(R),
                       jnp.zeros((R,), jnp.float32)])
    tminw = tmin.reshape(1, R)
    want = tmax.reshape(1, R) > tminw

    lo0, lo1, lo2 = (jnp.float32(v) for v in lo)
    h0, h1, h2 = (jnp.float32(v) for v in h)
    d0, d1, d2 = dims
    dxy = jnp.int32(d1 * d2)
    dz_ = jnp.int32(d2)
    eps = jnp.float32(1e-4 * min(h))

    # grid-box entry interval (per lane)
    def axis_t(p, inv, l, hh, n):
        t0 = (l - p) * inv
        t1 = (l + hh * n - p) * inv
        return jnp.minimum(t0, t1), jnp.maximum(t0, t1)

    ax0, bx0 = axis_t(px, ix, lo0, h0, d0)
    ay0, by0 = axis_t(py, iy, lo1, h1, d1)
    az0, bz0 = axis_t(pz, iz, lo2, h2, d2)
    tn_box = jnp.maximum(jnp.maximum(ax0, ay0), jnp.maximum(az0, tmin))
    tf_box = jnp.minimum(jnp.minimum(bx0, by0), bz0)
    miss_box = (tn_box > tf_box) | (tf_box < tmin)

    def slab_cluster(cslot, best_t):
        bx0_ = cl_aabb_ref[cslot, 0]
        by0_ = cl_aabb_ref[cslot, 1]
        bz0_ = cl_aabb_ref[cslot, 2]
        bx1_ = cl_aabb_ref[cslot, 3]
        by1_ = cl_aabb_ref[cslot, 4]
        bz1_ = cl_aabb_ref[cslot, 5]
        t0x = (bx0_ - px) * ix
        t1x = (bx1_ - px) * ix
        t0y = (by0_ - py) * iy
        t1y = (by1_ - py) * iy
        t0z = (bz0_ - pz) * iz
        t1z = (bz1_ - pz) * iz
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

    def intersect_cluster(slot, cslot, carry):
        best_t, best_i, best_u, best_v = carry
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
            return best_t, best_i, best_u, best_v
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
        best_t = jnp.minimum(best_t, bt)
        return best_t, best_i, best_u, best_v

    BIGF = jnp.int32(BIG_I)

    # outlier clusters (outside the dense-grid AABB, e.g. the overhead
    # area light) are intersected ONCE up front for every lane
    best0 = (tmax.reshape(1, R), jnp.full((1, R), -1, jnp.int32),
             jnp.zeros((1, R), jnp.float32), jnp.zeros((1, R), jnp.float32))
    if n_outliers > 0:
        get_dma(0, outliers_ref[0, 0]).start()

        def o_body(k, carry):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < n_outliers)
            def _():
                get_dma(1 - slot, outliers_ref[k + 1, 0]).start()

            get_dma(slot, outliers_ref[k, 0]).wait()
            return intersect_cluster(slot, outliers_ref[k, 0], carry)

        best0 = jax.lax.fori_loop(0, n_outliers, o_body, best0)

    init = (tn_box,                                        # t_cur [S,128]
            best0[0],                                      # best_t
            best0[1],                                      # best_i
            best0[2],
            best0[3],
            # done: i32 plane (no i1 carries, no i1 reshapes — tmax/tmin
            # are already [SUB,128] planes); miss-box lanes start done
            (miss_box | ~(tmax > tmin)).astype(jnp.int32),
            jnp.int32(0),                                  # iteration
            jnp.int32(0))                                  # clusters flushed

    def cond(s):
        done = s[5]
        it = s[6]
        return (it < march_max) & jnp.any(done == 0)

    def body(s):
        t_cur, best_t, best_i, best_u, best_v, done, it, n_fl = s
        live = done == 0
        # current cell (vector math)
        tc = t_cur + eps
        qx = jnp.floor((px + dx * tc - lo0) / h0)
        qy = jnp.floor((py + dy * tc - lo1) / h1)
        qz = jnp.floor((pz + dz * tc - lo2) / h2)
        inside = ((qx >= 0) & (qx < d0) & (qy >= 0) & (qy < d1)
                  & (qz >= 0) & (qz < d2))
        qxc = jnp.clip(qx, 0, d0 - 1).astype(jnp.int32)
        qyc = jnp.clip(qy, 0, d1 - 1).astype(jnp.int32)
        qzc = jnp.clip(qz, 0, d2 - 1).astype(jnp.int32)
        cell = qxc * dxy + qyc * dz_ + qzc
        cell = jnp.where(live & inside, cell, BIGF)
        # exit t of the current cell (vector)
        nx = lo0 + (qxc + (dx > 0)).astype(jnp.float32) * h0
        ny = lo1 + (qyc + (dy > 0)).astype(jnp.float32) * h1
        nz = lo2 + (qzc + (dz > 0)).astype(jnp.float32) * h2
        t_exit = jnp.minimum(jnp.minimum(
            jnp.where(jnp.abs(dx) > 1e-20, (nx - px) * ix, big),
            jnp.where(jnp.abs(dy) > 1e-20, (ny - py) * iy, big)),
            jnp.where(jnp.abs(dz) > 1e-20, (nz - pz) * iz, big))

        # collect the union cells' clusters (ascending cell id) until the
        # FLUSH_BUDGET cluster queue fills or CELL_ITER distinct cells were
        # seen; per-lane skip radius picked up per distinct cell (scalar
        # bcast).  Empty cells consume an iteration but no budget, so
        # spread-out tiles still advance most lanes every round.
        processed = jnp.zeros((SUB, 128), jnp.int32)
        radius = jnp.zeros((SUB, 128), jnp.float32)

        def c_cond(carry):
            qn, cur_min, processed, radius, c_it, stop = carry
            return (~stop) & (cur_min < BIG_I) & (c_it < CELL_ITER)

        def c_body(carry):
            qn, cur_min, processed, radius, c_it, stop = carry
            off = cell_tab_ref[cur_min, 0]
            cnt = cell_tab_ref[cur_min, 1]
            rad = cell_tab_ref[cur_min, 2]
            # a cell is taken whole or not at all; the FIRST cell may
            # exceed the budget alone (pack_grid bounds any cell by QCAP)
            fits = (qn + cnt <= FLUSH_BUDGET) | ((qn == 0) & (cnt <= QCAP))

            def do(args):
                qn, processed, radius = args

                def push(j, q):
                    queue_ref[q] = cell_cl_ref[off + j, 0]
                    return q + 1

                qn = jax.lax.fori_loop(0, cnt, push, qn)
                in_c = cell == cur_min
                processed = processed | in_c.astype(jnp.int32)
                radius = jnp.where(in_c, rad.astype(jnp.float32), radius)
                return qn, processed, radius

            qn, processed, radius = jax.lax.cond(
                fits, do, lambda a: a, (qn, processed, radius))
            nxt = jnp.min(jnp.where(cell > cur_min, cell, BIGF))
            cur_min = jnp.where(fits, nxt, cur_min)
            return qn, cur_min, processed, radius, c_it + 1, ~fits

        qn, _, processed, radius, _, _ = jax.lax.while_loop(
            c_cond, c_body,
            (jnp.int32(0), jnp.min(cell), processed, radius,
             jnp.int32(0), False))

        # flush with double-buffered DMA
        @pl.when(qn > 0)
        def _():
            get_dma(0, queue_ref[0]).start()

        def f_body(k, carry):
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < qn)
            def _():
                get_dma(1 - slot, queue_ref[k + 1]).start()

            get_dma(slot, queue_ref[k]).wait()
            alive = slab_cluster(queue_ref[k], carry[0].reshape(SUB, 128))
            return jax.lax.cond(
                alive, lambda c: intersect_cluster(slot, queue_ref[k], c),
                lambda c: c, carry)

        best_t, best_i, best_u, best_v = jax.lax.fori_loop(
            0, qn, f_body, (best_t, best_i, best_u, best_v))

        # advance / terminate.  Empty-space skip: within a chebyshev-r
        # empty ball every point can travel (r-1)*min_a(h_a/|d_a|) without
        # touching occupied cells (proximity clouds)
        adv = live & (processed != 0)
        bt_pl = best_t.reshape(SUB, 128)
        bi_pl = best_i.reshape(SUB, 128)
        if any_hit:
            newly_done = (~inside) | (bi_pl >= 0)
        else:
            newly_done = (~inside) | (adv & (bt_pl <= t_exit))
        t_cell_min = jnp.minimum(jnp.minimum(h0 * jnp.abs(ix),
                                             h1 * jnp.abs(iy)),
                                 h2 * jnp.abs(iz))
        t_skip = t_cur + jnp.maximum(radius - 1.0, 0.0) * t_cell_min
        t_cur = jnp.where(adv, jnp.maximum(t_exit, t_skip), t_cur)
        done = done | (live & newly_done).astype(jnp.int32)
        done = done | (t_cur >= tmax).astype(jnp.int32)
        return t_cur, best_t, best_i, best_u, best_v, done, it + 1, n_fl + qn

    _, best_t, best_i, best_u, best_v, done, it_end, n_fl = \
        jax.lax.while_loop(cond, body, init)

    out_t_ref[0] = best_t.reshape(SUB, 128)
    out_tri_ref[0] = best_i.reshape(SUB, 128)
    out_u_ref[0] = best_u.reshape(SUB, 128)
    out_v_ref[0] = best_v.reshape(SUB, 128)
    # lanes still live after MARCH_MAX rounds: UNRESOLVED — the caller must
    # re-trace them (the integrator routes them through the BVH walk) so
    # cap exhaustion can never silently drop a hit
    out_un_ref[0] = jnp.where(done == 0, 1, 0)
    if it_out_ref is not None:
        it_out_ref[0] = jnp.full((SUB, 128), it_end, jnp.int32)
        fl_out_ref[0] = jnp.full((SUB, 128), n_fl, jnp.int32)


@functools.partial(jax.jit, static_argnames=('grid_lo', 'grid_h',
                                             'grid_dims', 'any_hit',
                                             'n_outliers', 'interpret',
                                             'march_max', 'with_stats'))
def _march_impl(cell_tab, cell_cl, cl_aabb, outliers, tris_hbm,
                ray_pos, ray_dir, t_min, t_max,
                grid_lo, grid_h, grid_dims, any_hit, n_outliers, interpret,
                march_max=MARCH_MAX, with_stats=False):
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
    n_out = 7 if with_stats else 5
    outs = pl.pallas_call(
        functools.partial(_march_kernel, any_hit=any_hit,
                          n_outliers=n_outliers,
                          lo=grid_lo, h=grid_h, dims=grid_dims,
                          march_max=march_max, with_stats=with_stats),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(cell_tab.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cell_cl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(cl_aabb.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(outliers.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, SUB, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec] * n_out,
        out_shape=(
            [jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
             jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32),
             jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
             jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.float32),
             jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32)]
            + [jax.ShapeDtypeStruct((n_tiles, SUB, 128), jnp.int32)] * 2
            * with_stats),
        scratch_shapes=[
            pltpu.SMEM((QCAP,), jnp.int32),
            pltpu.VMEM((2, 8, WPAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(cell_tab, cell_cl, cl_aabb, outliers, tris_hbm, rays)
    t, tri, u, v, un = [o.reshape(n_tiles * TILE)[:N] for o in outs[:5]]
    if with_stats:
        stats = jnp.stack([outs[5][:, 0, 0], outs[6][:, 0, 0]], axis=-1)
        return t, tri, u, v, un, stats
    return t, tri, u, v, un


# Two-phase straggler compaction: DEFAULT OFF.  Measured on realistic
# 1M-ray city bounce populations (scripts/bench_march_phase.py): p1=16/32/64
# all LOSE 40-50% vs single-phase (b1 7.8 -> 5.3 Mrays/s, b2 9.3 -> 6.0) —
# at production ray density the straggler tail no longer dominates and the
# extra argsort + gathers + re-marched prefix swamp the tile-drag win.
# Kept (env HYDRA_MARCH_P1=N or phase1_max arg) as the P3 wavefront-
# compaction experiment; see docs/PERF_NOTES.md r5.
PHASE1_MAX = int(os.environ.get('HYDRA_MARCH_P1', '0'))


def intersect_march(grid: GridPack, tris_hbm, ray_pos, ray_dir, t_min,
                    t_max, any_hit: bool = False, interpret: bool = False,
                    march_max: int = None,
                    with_unresolved: bool = False, with_stats: bool = False,
                    phase1_max: int = None):
    """v2 DDA: the whole grid march runs inside one kernel per ray tile.

    Same output contract as intersect_stream / intersect_dda; with
    ``with_unresolved`` also returns a [N] i32 mask of lanes still live
    when MARCH_MAX was exhausted (hit/miss NOT final — re-trace those; the
    integrator falls back to the BVH walk).  Relies on the caller's
    Morton/octant ray sorting for tile cell-coherence (the integrator
    sorts streamed scenes per bounce).

    Two-phase straggler compaction (PERF_NOTES r5): per-tile stats showed
    the median tile finishes in ~13 rounds while TAIL tiles run to
    MARCH_MAX=192 — one grazing lane drags its whole [SUB,128] tile
    through full-width flush work for 10x the median round count.  So:
    phase 1 marches every lane with a low round cap (PHASE1_MAX); lanes
    still live are stable-sorted to the FRONT (preserving the caller's
    cell-coherent order among them) and re-marched from scratch with the
    full cap, while already-resolved lanes ride along with an empty
    [1, 0) interval so their tiles start done and exit after the outlier
    prologue.  Straggler work then concentrates in ceil(U/1024) dense
    tiles instead of being smeared across every tile that owns one."""
    mm = MARCH_MAX if march_max is None else march_max
    p1 = PHASE1_MAX if phase1_max is None else phase1_max
    N = ray_pos.shape[0]
    two_phase = (not with_stats) and 0 < p1 < mm and N >= 4 * TILE

    def run(pos, dr, t0, t1, cap):
        return _march_impl(grid.cell_tab, grid.cell_cl, grid.cl_aabb,
                           grid.outliers, tris_hbm, pos, dr, t0, t1,
                           grid.lo, grid.h, grid.dims, any_hit,
                           grid.n_outliers, interpret, cap, with_stats)

    if not two_phase:
        out = run(ray_pos, ray_dir, t_min, t_max, mm)
        if with_stats:
            return out
        t, tri, u, v, un = out
        if with_unresolved:
            return t, tri, u, v, un
        return t, tri, u, v

    t, tri, u, v, un = run(ray_pos, ray_dir, t_min, t_max, p1)
    # stable sort, stragglers first: among the stragglers the caller's
    # coherent order is preserved, so phase-2 tiles stay cell-dense
    perm = jnp.argsort(-un)
    sel = un[perm] > 0
    t2, tri2, u2, v2, un2 = run(
        ray_pos[perm], ray_dir[perm],
        jnp.where(sel, t_min[perm], 1.0),
        jnp.where(sel, t_max[perm], 0.0), mm)
    inv = jnp.argsort(perm)
    unb = un > 0
    t = jnp.where(unb, t2[inv], t)
    tri = jnp.where(unb, tri2[inv], tri)
    u = jnp.where(unb, u2[inv], u)
    v = jnp.where(unb, v2[inv], v)
    un = jnp.where(unb, un2[inv], 0)
    if with_unresolved:
        return t, tri, u, v, un
    return t, tri, u, v
