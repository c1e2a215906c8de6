"""Grid-DDA wavefront traversal vs the brute-force oracle.

Interpret mode on CPU; real-TPU throughput is measured by bench.py and
scripts/bench_traversal.py.  The DDA path reuses the streamed kernel's
Woop cluster blocks, so numerics match traverse_stream (Woop f32).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore3_tpu.accel import build_bvh
from hydracore3_tpu.accel import traverse as TRV
from hydracore3_tpu.accel import traverse_stream as TS
from hydracore3_tpu.accel import traverse_dda as TD


def build_all(v0, e1, e2, robust_aabb=True):
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TS.TBK)
    order = bvh.order
    v0o, e1o, e2o = v0[order], e1[order], e2[order]
    nodes_f, nodes_i, tris_hbm, order_padded = TS.pack_stream_bvh(
        bvh, v0o, e1o, e2o)
    grid = TD.pack_grid(nodes_f, nodes_i, robust_aabb=robust_aabb)
    return grid, jnp.asarray(tris_hbm), order_padded, (v0o, e1o, e2o)


def random_scene(rng, n_tris, spread=4.0):
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


@pytest.mark.parametrize('n_tris,n_rays', [(300, 1024), (2000, 1500)])
def test_dda_vs_brute(n_tris, n_rays):
    rng = np.random.default_rng(23 + n_tris)
    v0, e1, e2 = random_scene(rng, n_tris)
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(
        v0, e1, e2, robust_aabb=False)

    pos = rng.uniform(-6, 6, (n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n_rays,))
    tmax = jnp.full((n_rays,), 1e30)

    t, tri, u, v = TD.intersect_dda(grid, tris_hbm, pos, d, tmin, tmax,
                                    interpret=True)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(n_tris, jnp.int32), jnp.zeros(n_tris, jnp.int32),
        jnp.arange(n_tris, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s],
                               np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)
    leaf_idx = order_padded[np.asarray(tri)[hit_s]]
    assert (leaf_idx >= 0).all()


def test_dda_any_hit_and_range():
    rng = np.random.default_rng(5)
    v0, e1, e2 = random_scene(rng, 800)
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(
        v0, e1, e2, robust_aabb=False)
    n = 1024
    pos = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    # finite shadow-style range: occlusion must respect tmax
    tmax = jnp.full((n,), 3.0)
    _, tri, _, _ = TD.intersect_dda(grid, tris_hbm, pos, d, tmin, tmax,
                                    any_hit=True, interpret=True)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(800, jnp.int32), jnp.zeros(800, jnp.int32),
        jnp.arange(800, dtype=jnp.int32),
        pos, d, tmin, tmax)
    occ_s = np.asarray(tri) >= 0
    occ_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(occ_s, occ_r)


def test_dda_matches_stream_on_city_soup():
    """Cross-check the two big-scene tracers against each other on
    structured (wall/ground) geometry with grazing rays."""
    from hydracore3_tpu.scene import synth
    rng = np.random.default_rng(0)
    pos_l, idx_l = [], []
    gp, gi = synth._ground(30.0, 8)
    pos_l.append(gp)
    idx_l.append(gi)
    voff = len(gp)
    for bx in range(4):
        for by in range(4):
            p, i = synth._box((bx - 2) * 12 + 6, (by - 2) * 12 + 6,
                              3.0, 3.0, rng.uniform(4, 20), 2)
            pos_l.append(p)
            idx_l.append(i + voff)
            voff += len(p)
    P = np.concatenate(pos_l)
    I = np.concatenate(idx_l)
    v0 = P[I[:, 0]].astype(np.float32)
    e1 = (P[I[:, 1]] - P[I[:, 0]]).astype(np.float32)
    e2 = (P[I[:, 2]] - P[I[:, 0]]).astype(np.float32)
    grid, tris_hbm, _, _ = build_all(v0, e1, e2, robust_aabb=False)
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TS.TBK)
    order = bvh.order
    nodes_f, nodes_i, tris_hbm2, _ = TS.pack_stream_bvh(
        bvh, v0[order], e1[order], e2[order])

    n = 1024
    pos = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    pos[:, 1] = rng.uniform(0.5, 25, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t1, tri1, u1, v1 = TD.intersect_dda(grid, tris_hbm, pos, d, tmin, tmax,
                                        interpret=True)
    t2, tri2, u2, v2 = TS.intersect_stream(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris_hbm2),
        pos, d, tmin, tmax, interpret=True)
    h1 = np.asarray(tri1) >= 0
    h2 = np.asarray(tri2) >= 0
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_allclose(np.asarray(t1)[h1], np.asarray(t2)[h2],
                               rtol=1e-5, atol=1e-6)


def test_dda_staggered_exit():
    """Regression (advisor r4): v1 round_body computed `inside` BEFORE the
    per-round argsort but used it after every other array was permuted, so
    when some rays exited the grid while others still marched, the WRONG
    lanes were marked done and their intersections silently dropped."""
    rng = np.random.default_rng(77)
    # triangles only in a thin slab at x in [3, 4] — rays crossing the grid
    # toward +x march many rounds before hitting; rays pointing -x exit the
    # grid almost immediately (staggered exit rounds)
    v0, e1, e2 = random_scene(rng, 500, spread=0.4)
    v0[:, 0] += 3.5
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(
        v0, e1, e2, robust_aabb=False)
    n = 1024
    pos = rng.uniform(-4, -3, (n, 3)).astype(np.float32)
    pos[:, 1] = rng.uniform(-1, 1, n)
    pos[:, 2] = rng.uniform(-1, 1, n)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    # half march across toward the slab; half exit backwards right away
    d[::2, 0] = np.abs(d[::2, 0]) + 2.0
    d[1::2, 0] = -np.abs(d[1::2, 0]) - 2.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t, tri, u, v = TD.intersect_dda(grid, tris_hbm, pos, d, tmin, tmax,
                                    interpret=True)
    T = len(v0)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(T, jnp.int32), jnp.zeros(T, jnp.int32),
        jnp.arange(T, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s],
                               np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize('any_hit', [False, True])
def test_march_vs_brute(any_hit):
    """v2 in-kernel marching DDA vs the brute oracle."""
    rng = np.random.default_rng(31)
    v0, e1, e2 = random_scene(rng, 1500)
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(v0, e1, e2)
    n = 1200
    pos = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 4.0 if any_hit else 1e30)
    t, tri, u, v = TD.intersect_march(grid, tris_hbm, pos, d, tmin, tmax,
                                      any_hit=any_hit, interpret=True)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(1500, jnp.int32), jnp.zeros(1500, jnp.int32),
        jnp.arange(1500, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    if not any_hit:
        np.testing.assert_allclose(np.asarray(t)[hit_s],
                                   np.asarray(ref.t)[hit_r],
                                   rtol=2e-4, atol=1e-5)


def test_march_unresolved_flag_and_fallback():
    """Cap-exhaustion safety (VERDICT r4 weak #5): a march stopped at
    MARCH_MAX must FLAG its still-live lanes instead of silently returning
    best-so-far, and the BVH-walk fallback merge must restore exact parity
    with the brute oracle."""
    rng = np.random.default_rng(9)
    v0, e1, e2 = random_scene(rng, 1200)
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(
        v0, e1, e2, robust_aabb=False)
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TS.TBK)
    nodes_f, nodes_i, tris_hbm2, _ = TS.pack_stream_bvh(
        bvh, v0[bvh.order], e1[bvh.order], e2[bvh.order])
    n = 1024
    pos = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)

    # full-budget run resolves everything
    *_, un = TD.intersect_march(grid, tris_hbm, pos, d, tmin, tmax,
                                interpret=True, with_unresolved=True)
    assert int(np.asarray(un).sum()) == 0

    # starve the march: 2 rounds cannot cross the grid
    t, tri, u, v, un = TD.intersect_march(
        grid, tris_hbm, pos, d, tmin, tmax, interpret=True,
        march_max=2, with_unresolved=True)
    un = np.asarray(un) > 0
    assert un.sum() > 0, 'starved march must report unresolved lanes'

    # fallback merge (the integrator's recipe): re-trace unresolved lanes
    # through the BVH walk with resolved lanes given an empty interval
    ft, ftri, fu, fv = TS.intersect_stream(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris_hbm2),
        pos, d, jnp.where(jnp.asarray(un), tmin, 1.0),
        jnp.where(jnp.asarray(un), tmax, 0.0), interpret=True)
    t = np.where(un, np.asarray(ft), np.asarray(t))
    tri = np.where(un, np.asarray(ftri), np.asarray(tri))

    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(1200, jnp.int32), jnp.zeros(1200, jnp.int32),
        jnp.arange(1200, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = tri >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(t[hit_s], np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)


def test_march_outlier_clusters():
    """A far-flung overhead quad (the area-light pattern) must land in the
    outlier list and still be hittable; rays into the dense region are
    unaffected."""
    rng = np.random.default_rng(4)
    v0, e1, e2 = random_scene(rng, 600)          # dense cloud around origin
    # big quad far above: 64+ tris so it forms its own clusters
    n_far = TS.TBK
    fx = rng.uniform(-40, 40, n_far).astype(np.float32)
    fz = rng.uniform(-40, 40, n_far).astype(np.float32)
    fv0 = np.stack([fx, np.full(n_far, 120.0, np.float32), fz], -1)
    fe1 = np.tile(np.array([[3.0, 0, 0]], np.float32), (n_far, 1))
    fe2 = np.tile(np.array([[0, 0, 3.0]], np.float32), (n_far, 1))
    v0 = np.concatenate([v0, fv0])
    e1 = np.concatenate([e1, fe1])
    e2 = np.concatenate([e2, fe2])
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(v0, e1, e2)
    assert grid.n_outliers > 0, 'far quad should be outlier clusters'

    n = 1024
    pos = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:n // 2, 1] = np.abs(d[:n // 2, 1]) + 2.0   # aim half upward
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t, tri, u, v = TD.intersect_march(grid, tris_hbm, pos, d, tmin, tmax,
                                      interpret=True)
    T = len(v0)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(T, jnp.int32), jnp.zeros(T, jnp.int32),
        jnp.arange(T, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s],
                               np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)


def test_march_two_phase_compaction():
    """Two-phase straggler compaction (PERF_NOTES r5): with a tiny phase-1
    cap most lanes go unresolved, get stable-sorted to the front and
    re-marched from scratch — the merged result must still match the brute
    oracle exactly, and nothing may leak from the empty-interval lanes."""
    rng = np.random.default_rng(77)
    v0, e1, e2 = random_scene(rng, 2500, spread=6.0)
    grid, tris_hbm, order_padded, (v0o, e1o, e2o) = build_all(v0, e1, e2)
    n = 5 * 1024          # >= 4*TILE so the two-phase path engages
    pos = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t, tri, u, v, un = TD.intersect_march(
        grid, tris_hbm, pos, d, tmin, tmax, interpret=True,
        phase1_max=2, with_unresolved=True)
    assert int(np.asarray(un).sum()) == 0, \
        'full-cap phase 2 must resolve every straggler on this scene'
    T = len(v0)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(T, jnp.int32), jnp.zeros(T, jnp.int32),
        jnp.arange(T, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s],
                               np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)
