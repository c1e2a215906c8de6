"""RNG tests: vectorized generator must match a scalar reimplementation of
the reference's crandom.h semantics, and masked draws must freeze state."""
import numpy as np
import jax.numpy as jnp

from hydracore3_tpu.ops import rng as RNG


def _scalar_next(state):
    """Scalar uint32 model of NextState (crandom.h:17-23)."""
    m = np.uint64(0xFFFFFFFF)
    x = np.uint32((np.uint64(state[0]) * 17 + np.uint64(state[1]) * 13123) & m)
    nx = np.uint32(((np.uint64(x) << np.uint64(13)) & m) ^ np.uint64(x))
    ny = np.uint32(np.uint64(state[1]) ^ ((np.uint64(x) << np.uint64(7)) & m))
    return (nx, ny), x


def _scalar_init(seed):
    m = np.uint64(0xFFFFFFFF)
    s = np.uint64(np.uint32(seed))
    x = np.uint32((s * ((s * s * np.uint64(15731)) & m) + s * np.uint64(74323) + np.uint64(871483)) & m)
    # NOTE: C computes a_seed*(a_seed*a_seed*15731 + 74323) + 871483 in int32
    x = np.uint32((s * (((s * s * np.uint64(15731)) + np.uint64(74323)) & m) + np.uint64(871483)) & m)
    y = np.uint32((s * (((s * s * np.uint64(13734)) + np.uint64(37828)) & m) + np.uint64(234234)) & m)
    st = (x, y)
    for _ in range(seed % 7):
        st, _ = _scalar_next(st)
    return st


def test_gen_init_matches_scalar():
    ids = np.arange(32)
    state = np.asarray(RNG.gen_init(jnp.asarray(ids)))
    for i in ids:
        sx, sy = _scalar_init(int(i))
        assert state[i, 0] == sx and state[i, 1] == sy, i


def test_float_range_and_determinism():
    state = RNG.gen_init(jnp.arange(1000))
    s1, r4 = RNG.rnd_float4(state)
    _, r4b = RNG.rnd_float4(state)
    r4 = np.asarray(r4)
    assert (r4 >= 0).all() and (r4 <= 1.0).all()
    np.testing.assert_array_equal(r4, np.asarray(r4b))
    # distribution sanity
    assert abs(r4.mean() - 0.5) < 0.02


def test_masked_draw_freezes_state():
    state = RNG.gen_init(jnp.arange(8))
    mask = jnp.asarray([True, False] * 4)
    ns, _ = RNG.rnd_float4(state, mask)
    ns = np.asarray(ns)
    s0 = np.asarray(state)
    assert (ns[1::2] == s0[1::2]).all()
    assert (ns[0::2] != s0[0::2]).any()


def test_lgts_consumes_two_draws():
    state = RNG.gen_init(jnp.arange(4))
    s1, _ = RNG.rnd_float1(state)
    s2, _ = RNG.rnd_float4(s1)
    s_lgts, _ = RNG.rnd_lgts(state)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s_lgts))
