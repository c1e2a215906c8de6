"""Pallas cluster-BVH traversal kernel vs the brute-force oracle.

Runs in Pallas interpreter mode on CPU (the kernel itself is exercised on
real TPU by bench/scripts); hit agreement must be exact because both paths
evaluate the same Moller-Trumbore in f32 and pick the strictly-nearest t.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore3_tpu.accel import build_bvh
from hydracore3_tpu.accel import traverse as TRV
from hydracore3_tpu.accel import traverse_pallas as TP


def random_scene(rng, n_tris, spread=4.0):
    v0 = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


def random_rays(rng, n, spread=4.0):
    pos = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(pos), jnp.asarray(d)


@pytest.mark.parametrize('n_tris,n_rays', [(37, 256), (300, 1500)])
def test_pallas_vs_brute(n_tris, n_rays):
    rng = np.random.default_rng(42 + n_tris)
    v0, e1, e2 = random_scene(rng, n_tris)
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TP.CLUSTER)
    order = bvh.order
    v0o, e1o, e2o = v0[order], e1[order], e2[order]
    nodes_f, nodes_i, tris12 = TP.pack_cluster_bvh(bvh, v0o, e1o, e2o)

    pos, d = random_rays(rng, n_rays)
    tmin = jnp.zeros((n_rays,))
    tmax = jnp.full((n_rays,), 1e30)

    t, tri, u, v = TP.intersect_clusters(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris12),
        pos, d, tmin, tmax, interpret=True)

    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(n_tris, jnp.int32), jnp.zeros(n_tris, jnp.int32),
        jnp.arange(n_tris, dtype=jnp.int32),
        pos, d, tmin, tmax)

    hit_p = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_p, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_p], np.asarray(ref.t)[hit_r],
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u)[hit_p], np.asarray(ref.u)[hit_r],
                               rtol=1e-4, atol=1e-5)


def test_pallas_any_hit():
    rng = np.random.default_rng(9)
    v0, e1, e2 = random_scene(rng, 120)
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TP.CLUSTER)
    order = bvh.order
    nodes_f, nodes_i, tris12 = TP.pack_cluster_bvh(
        bvh, v0[order], e1[order], e2[order])
    n = 777
    pos, d = random_rays(rng, n)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t, tri, _, _ = TP.intersect_clusters(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris12),
        pos, d, tmin, tmax, interpret=True)
    t2, tri2, _, _ = TP.intersect_clusters(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris12),
        pos, d, tmin, tmax, any_hit=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(tri) >= 0, np.asarray(tri2) >= 0)


def test_pallas_any_hit_no_premature_tile_exit():
    """ADVICE r2 (high): the any-hit early exit must not use the CURRENT
    leaf's slab mask as the liveness test.  Two spatially separated leaves;
    lanes aimed at leaf A all get occluded there, lanes aimed only at leaf B
    (outside A's AABB) must still be tested against B — the buggy exit
    dropped them as unoccluded (light leaks)."""
    # hand-built skip-pointer BVH: root(internal) -> leafA -> leafB
    # leaf A: big quad-ish triangle around origin at z=0
    # leaf B: big triangle around x=100 at z=0
    triA = (np.array([-10., -10., 0.]), np.array([20., 0., 0.]),
            np.array([0., 20., 0.]))
    triB = (np.array([90., -10., 0.]), np.array([20., 0., 0.]),
            np.array([0., 20., 0.]))
    tris12 = np.zeros((2, 12), np.float32)
    tris12[0, 0:3], tris12[0, 3:6], tris12[0, 6:9] = triA
    tris12[1, 0:3], tris12[1, 3:6], tris12[1, 6:9] = triB
    nodes_f = np.zeros((3, 8), np.float32)
    nodes_i = np.zeros((3, 4), np.int32)
    nodes_f[0, 0:3], nodes_f[0, 3:6] = (-10, -10, -1), (110, 10, 1)   # root
    nodes_f[1, 0:3], nodes_f[1, 3:6] = (-10, -10, -1), (10, 10, 1)    # leaf A
    nodes_f[2, 0:3], nodes_f[2, 3:6] = (90, -10, -1), (110, 10, 1)    # leaf B
    nodes_i[0] = (-1, 0, 0, 0)   # internal: skip=-1, descend -> node 1
    nodes_i[1] = (2, 0, 1, 0)    # leaf A: tri 0, skip -> node 2
    nodes_i[2] = (-1, 1, 1, 0)   # leaf B: tri 1, end

    n = TP.TILE  # exactly one tile, no padded lanes
    pos = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([0., 0., 1.], np.float32), (n, 1))
    half = n // 2
    pos[:half] = (0., 0., -5.)      # group 1: occluded by leaf A
    pos[half:] = (100., 0., -5.)    # group 2: occluded only by leaf B
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 10.0)

    _, tri, _, _ = TP.intersect_clusters(
        jnp.asarray(nodes_f), jnp.asarray(nodes_i), jnp.asarray(tris12),
        jnp.asarray(pos), jnp.asarray(d), tmin, tmax,
        any_hit=True, interpret=True)
    occluded = np.asarray(tri) >= 0
    assert occluded.all(), (
        f'{(~occluded).sum()} lanes falsely unoccluded (premature tile exit)')
