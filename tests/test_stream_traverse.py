"""Streaming (HBM-triangle) cluster-BVH kernel vs the brute-force oracle.

Runs in Pallas interpreter mode on CPU; the kernel is exercised on real TPU
by bench.py / scripts/bench_traversal.py.  The streamed kernel uses the
Woop-transform intersection (different arithmetic from the oracle's
Moller-Trumbore), so hits are compared by winner identity and t/u/v within
f32 tolerance.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore3_tpu.accel import build_bvh
from hydracore3_tpu.accel import traverse as TRV
from hydracore3_tpu.accel import traverse_stream as TS


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


def build_stream(v0, e1, e2):
    bvh = build_bvh.build(v0, e1, e2, max_leaf=TS.TBK)
    order = bvh.order
    v0o, e1o, e2o = v0[order], e1[order], e2[order]
    nodes_f, nodes_i, tris_hbm, order_padded = TS.pack_stream_bvh(
        bvh, v0o, e1o, e2o)
    return (jnp.asarray(nodes_f), jnp.asarray(nodes_i),
            jnp.asarray(tris_hbm), order_padded, (v0o, e1o, e2o))


@pytest.mark.parametrize('n_tris,n_rays', [(37, 256), (1000, 1500)])
def test_stream_vs_brute(n_tris, n_rays):
    rng = np.random.default_rng(17 + n_tris)
    v0, e1, e2 = random_scene(rng, n_tris)
    nodes_f, nodes_i, tris_hbm, order_padded, (v0o, e1o, e2o) = \
        build_stream(v0, e1, e2)

    pos, d = random_rays(rng, n_rays)
    tmin = jnp.zeros((n_rays,))
    tmax = jnp.full((n_rays,), 1e30)

    t, tri, u, v = TS.intersect_stream(
        nodes_f, nodes_i, tris_hbm, pos, d, tmin, tmax, interpret=True)

    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(n_tris, jnp.int32), jnp.zeros(n_tris, jnp.int32),
        jnp.arange(n_tris, dtype=jnp.int32),
        pos, d, tmin, tmax)

    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s], np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)
    # winner triangles must agree (up to t-ties): map padded index -> leaf
    # order and compare against the oracle's winner by t closeness
    leaf_idx = order_padded[np.asarray(tri)[hit_s]]
    assert (leaf_idx >= 0).all(), 'padded (nonexistent) triangle reported'
    np.testing.assert_allclose(np.asarray(u)[hit_s], np.asarray(ref.u)[hit_r],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(v)[hit_s], np.asarray(ref.v)[hit_r],
                               rtol=2e-3, atol=2e-4)


def test_stream_queue_overflow():
    """More leaves than QCAP along one ray forces multiple walk/flush
    rounds; results must still match brute force."""
    rng = np.random.default_rng(5)
    # a long corridor of small tris along +x so one ray's walk hits many
    # leaves: tris at x = i, tiny offsets so each lands in its own leaf
    n = TS.TBK * (TS.QCAP // 16)    # enough tris for > QCAP/16 leaves
    x = np.repeat(np.arange(n // 8), 8).astype(np.float32)
    v0 = np.stack([x, rng.uniform(-4, 4, n).astype(np.float32),
                   rng.uniform(-4, 4, n).astype(np.float32)], -1)
    e1 = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    nodes_f, nodes_i, tris_hbm, order_padded, (v0o, e1o, e2o) = \
        build_stream(v0, e1, e2)

    n_rays = 64
    pos = np.zeros((n_rays, 3), np.float32)
    pos[:, 0] = -2.0
    pos[:, 1] = rng.uniform(-3, 3, n_rays)
    pos[:, 2] = rng.uniform(-3, 3, n_rays)
    d = np.tile(np.array([1., 0., 0.], np.float32), (n_rays, 1))
    d += rng.normal(scale=0.02, size=(n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pos, d = jnp.asarray(pos), jnp.asarray(d)
    tmin = jnp.zeros((n_rays,))
    tmax = jnp.full((n_rays,), 1e30)

    t, tri, u, v = TS.intersect_stream(
        nodes_f, nodes_i, tris_hbm, pos, d, tmin, tmax, interpret=True)
    ref = TRV.intersect_brute(
        jnp.asarray(v0o), jnp.asarray(e1o), jnp.asarray(e2o),
        jnp.zeros(n, jnp.int32), jnp.zeros(n, jnp.int32),
        jnp.arange(n, dtype=jnp.int32),
        pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(ref.t) < 1e29
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s], np.asarray(ref.t)[hit_r],
                               rtol=2e-4, atol=1e-5)


def test_stream_any_hit_matches_nearest():
    rng = np.random.default_rng(9)
    v0, e1, e2 = random_scene(rng, 500)
    nodes_f, nodes_i, tris_hbm, _, _ = build_stream(v0, e1, e2)
    n = 777
    pos, d = random_rays(rng, n)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    _, tri, _, _ = TS.intersect_stream(
        nodes_f, nodes_i, tris_hbm, pos, d, tmin, tmax, interpret=True)
    _, tri2, _, _ = TS.intersect_stream(
        nodes_f, nodes_i, tris_hbm, pos, d, tmin, tmax, any_hit=True,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(tri) >= 0, np.asarray(tri2) >= 0)


def test_stream_any_hit_no_premature_tile_exit():
    """Same regression scenario as the VMEM kernel (ADVICE r2 high): lanes
    aimed only at a later leaf must still be tested after earlier lanes
    become occluded."""
    triA = (np.array([-10., -10., 0.]), np.array([20., 0., 0.]),
            np.array([0., 20., 0.]))
    triB = (np.array([90., -10., 0.]), np.array([20., 0., 0.]),
            np.array([0., 20., 0.]))
    v0 = np.stack([triA[0], triB[0]]).astype(np.float32)
    e1 = np.stack([triA[1], triB[1]]).astype(np.float32)
    e2 = np.stack([triA[2], triB[2]]).astype(np.float32)
    nodes_f, nodes_i, tris_hbm, _, _ = build_stream(v0, e1, e2)

    n = TS.TILE
    pos = np.zeros((n, 3), np.float32)
    d = np.tile(np.array([0., 0., 1.], np.float32), (n, 1))
    half = n // 2
    pos[:half] = (0., 0., -5.)
    pos[half:] = (100., 0., -5.)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 10.0)
    _, tri, _, _ = TS.intersect_stream(
        nodes_f, nodes_i, tris_hbm, jnp.asarray(pos), jnp.asarray(d),
        tmin, tmax, any_hit=True, interpret=True)
    occluded = np.asarray(tri) >= 0
    assert occluded.all(), (
        f'{(~occluded).sum()} lanes falsely unoccluded (premature tile exit)')
