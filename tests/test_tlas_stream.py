"""Streamed two-level (TLAS) traversal vs the XLA two-level oracle.

Interpret mode on CPU; instances include rotation + nonuniform placement
so the object-space transform path is actually exercised.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from hydracore3_tpu.accel import traverse_tlas as TT
from hydracore3_tpu.accel import two_level as TL2


def _mesh_box(n=60, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.4, 0.4, (n, 3)).astype(np.float32)
    return v0, e1, e2


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s, 0], [0, 1, 0, 0],
                     [-s, 0, c, 0], [0, 0, 0, 1]], np.float32)


def _place(x, y, z, rot=0.0, scale=1.0):
    m = _rot_y(rot)
    m[:3, :3] *= scale
    m[0, 3], m[1, 3], m[2, 3] = x, y, z
    return m


def _build(seed=0, n_inst=9):
    meshes = [_mesh_box(60, seed), _mesh_box(90, seed + 1)]
    rng = np.random.default_rng(seed + 7)
    instances = []
    for i in range(n_inst):
        instances.append(dict(
            geom_id=int(i % 2),
            m0=_place(rng.uniform(-6, 6), rng.uniform(-6, 6),
                      rng.uniform(-6, 6), rot=rng.uniform(0, 6.28),
                      scale=rng.uniform(0.5, 1.6))))
    pk = TT.pack_stream_tlas(meshes, instances)
    tl = TL2.build_two_level([(jnp.asarray(v), jnp.asarray(e1),
                               jnp.asarray(e2))
                              for (v, e1, e2) in meshes],
                             [dict(geom_id=i['geom_id'], m0=i['m0'],
                                   m1=None) for i in instances],
                             max_leaf=4)
    tl = jax.tree_util.tree_map(jnp.asarray, tl)
    return meshes, instances, pk, tl


import jax  # noqa: E402


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-9, 9, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(pos), jnp.asarray(d)


def test_tlas_stream_vs_two_level_nearest():
    meshes, instances, pk, tl = _build()
    n = 1024
    pos, d = _rays(n)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 1e30)
    t, tri, u, v, inst = TT.intersect_stream_tlas(
        jnp.asarray(pk['tlas_f']), jnp.asarray(pk['tlas_i']),
        jnp.asarray(pk['nodes_f']), jnp.asarray(pk['nodes_i']),
        jnp.asarray(pk['inst_f']), jnp.asarray(pk['inst_i']),
        jnp.asarray(pk['tris_hbm']), pos, d, tmin, tmax, interpret=True)
    rt, rtri, rinst, ru, rv = TL2.intersect_two_level(
        tl, pos, d, tmin, tmax)
    hit_s = np.asarray(tri) >= 0
    hit_r = np.asarray(rtri) >= 0
    np.testing.assert_array_equal(hit_s, hit_r)
    np.testing.assert_allclose(np.asarray(t)[hit_s],
                               np.asarray(rt)[hit_r], rtol=2e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(inst)[hit_s],
                                  np.asarray(rinst)[hit_r])
    # triangle identity: padded leaf slot -> original mesh-local prim id,
    # which must agree with the oracle's obj_prim_id (modulo twin hits at
    # exactly-equal t, which the tolerance t-check above already accepts)
    op = pk['order_padded']
    tm = pk['tri_mesh']
    s = np.asarray(tri)[hit_s]
    local = op[s]
    mesh = tm[s]
    assert (local >= 0).all() and (mesh >= 0).all()
    oracle_prim = np.asarray(tl.obj_prim_id)[np.asarray(rtri)[hit_r]]
    agree = (local == oracle_prim).mean()
    assert agree > 0.99, f'prim ids agree only {agree:.4%}'
    # object-space barycentrics match
    np.testing.assert_allclose(np.asarray(u)[hit_s], np.asarray(ru)[hit_r],
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(v)[hit_s], np.asarray(rv)[hit_r],
                               rtol=5e-3, atol=5e-4)


def test_tlas_stream_any_hit():
    meshes, instances, pk, tl = _build(seed=3)
    n = 1024
    pos, d = _rays(n, seed=5)
    tmin = jnp.zeros((n,))
    tmax = jnp.full((n,), 6.0)    # finite shadow-style range
    _, tri, _, _, _ = TT.intersect_stream_tlas(
        jnp.asarray(pk['tlas_f']), jnp.asarray(pk['tlas_i']),
        jnp.asarray(pk['nodes_f']), jnp.asarray(pk['nodes_i']),
        jnp.asarray(pk['inst_f']), jnp.asarray(pk['inst_i']),
        jnp.asarray(pk['tris_hbm']), pos, d, tmin, tmax,
        any_hit=True, interpret=True)
    rt, rtri, _, _, _ = TL2.intersect_two_level(tl, pos, d, tmin, tmax)
    occ_s = np.asarray(tri) >= 0
    occ_r = np.asarray(rtri) >= 0
    np.testing.assert_array_equal(occ_s, occ_r)


@pytest.mark.heavy
def test_instanced_city_pass_matches_two_level(tmp_path):
    """End-to-end: the instanced city rendered through the streamed TLAS
    path matches the XLA two-level oracle pass (same scene, same RNG)."""
    import dataclasses
    from hydracore3_tpu.scene import synth
    from hydracore3_tpu.models import integrator_pt as IPT
    from hydracore3_tpu.ops import rng as RNG
    kw = dict(n_blocks=3, subdiv=1, seed=5, width=48, height=32, depth=3,
              ground_subdiv=6)
    scene, meta = synth.instanced_city_scene(
        **kw, accel='stream_tlas', cache_dir=str(tmp_path / 'tlas'))
    assert meta.use_stream_tlas
    scene2, meta2 = synth.instanced_city_scene(
        **kw, accel='two_level', cache_dir=str(tmp_path / 'tl'))
    assert meta2.use_two_level and not meta2.use_stream_tlas
    N = meta.width * meta.height
    pix = jnp.arange(N, dtype=jnp.int32)

    acc_s, _, fl_s, rng_s, _ = IPT.trace_pass(scene, meta, RNG.gen_init(pix),
                                              pix)
    acc_b, _, fl_b, rng_b, _ = IPT.trace_pass(scene2, meta2,
                                              RNG.gen_init(pix), pix)
    acc_s, acc_b = np.asarray(acc_s), np.asarray(acc_b)
    # knife-edge / twin-hit rays may diverge; demand near-total agreement
    close = np.isclose(acc_s, acc_b, rtol=1e-3, atol=1e-3).all(axis=-1)
    assert close.mean() > 0.995, f'only {close.mean():.4%} pixels agree'
    assert (np.asarray(fl_s) == np.asarray(fl_b)).mean() > 0.99


def test_tlas_memory_is_o_mesh():
    """1000 instances of one mesh must NOT replicate triangle storage."""
    mesh = _mesh_box(120, 11)
    instances = [dict(geom_id=0, m0=_place(float(i % 32), 0.0,
                                           float(i // 32), rot=0.1 * i))
                 for i in range(1000)]
    pk = TT.pack_stream_tlas([mesh], instances)
    n_clusters = pk['tris_hbm'].shape[0]
    assert n_clusters <= -(-120 // TT.TBK) + 2   # O(mesh), not O(inst*mesh)
    assert pk['inst_f'].shape[0] == 1000
