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
