"""Sobol/Niederreiter QMC sequence (reference mlt/rnd_qmc.{h,cpp}).

11 dimensions x 31 bits, table-driven: ``rnd_float(pos, dim)`` XORs the
direction numbers selected by the bits of ``pos`` (rnd_qmc.cpp:189-196).
The direction-number table is generated once on the host with the
Bratley-Fox-Niederreiter construction (irreducible polynomials over GF(2)),
a direct port of GenerateCJ (rnd_qmc.cpp:81-176).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

QRNG_DIMENSIONS = 11
QRNG_RESOLUTION = 31
INT_SCALE = float(1.0 / 0x80000001)


def _generate_polynomials(count: int, primitive: bool = False) -> list[int]:
    """All irreducible polynomials over GF(2), smallest first."""
    buffer = [0x2]
    p1 = 0x2
    while len(buffer) < count:
        p1 += 1
        # degree of p1
        e_p1 = p1.bit_length() - 1
        ok = True
        for b in buffer:
            e_b = b.bit_length() - 1
            # polynomial division p1 mod b
            p2 = p1
            while p2.bit_length() - 1 >= e_b and p2:
                p2 ^= b << (p2.bit_length() - 1 - e_b)
            if p2 == 0:
                ok = False
                break
        if ok:
            buffer.append(p1)
    return buffer


def _generate_cj() -> np.ndarray:
    """cjn[bit][dim] 63-bit direction numbers (GenerateCJ port)."""
    polys = _generate_polynomials(QRNG_DIMENSIONS)
    cjn = np.zeros((63, QRNG_DIMENSIONS), dtype=np.uint64)

    for d, poly in enumerate(polys):
        e = poly.bit_length() - 1  # degree
        p_coeffs = [(poly >> (e - i)) & 1 for i in range(e + 1)]
        # b starts as polynomial '1'
        b = [1]
        m = 0
        v = {}
        u = e
        for j in range(62, -1, -1):
            if u == e:
                u = 0
                # b *= p
                m1 = m
                t = list(b)
                m += e
                nb = [0] * (m + 1)
                for i in range(m + 1):
                    acc = 0
                    ip = e - (m - i)
                    it = m1
                    while ip <= e and it >= 0:
                        if ip >= 0:
                            acc ^= p_coeffs[ip] & t[it]
                        ip += 1
                        it -= 1
                    nb[i] = acc
                b = nb
                # calculate v[0 .. 63+e-2]
                v = [0] * (63 + e - 1)
                for i in range(m1, m):
                    v[i] = 1
                for i in range(m, 63 + e - 1):
                    acc = 0
                    for it in range(1, m + 1):
                        acc ^= v[i - it] & b[it]
                    v[i] = acc
            for i in range(63):
                cjn[i, d] |= np.uint64(v[i + u]) << np.uint64(j)
            u += 1
    return cjn


@functools.lru_cache(maxsize=1)
def nied_table() -> np.ndarray:
    """qmc::init: uint32[QRNG_DIMENSIONS, QRNG_RESOLUTION]."""
    cjn = _generate_cj()
    table = np.zeros((QRNG_DIMENSIONS, QRNG_RESOLUTION), np.uint32)
    for dim in range(QRNG_DIMENSIONS):
        for bit in range(QRNG_RESOLUTION):
            table[dim, bit] = np.uint32((cjn[bit, dim] >> np.uint64(32))
                                        & np.uint64(0x7FFFFFFF))
    return table


def rnd_float(table, pos, dim: int):
    """qmc::rndFloat vectorized: pos uint32 [N], static dim -> float [N]."""
    pos = jnp.asarray(pos).astype(jnp.uint32)
    result = jnp.zeros_like(pos)
    row = table[dim]
    for bit in range(QRNG_RESOLUTION):
        take = (pos >> jnp.uint32(bit)) & jnp.uint32(1)
        result = result ^ jnp.where(take == 1, row[bit], jnp.uint32(0))
    return (result + jnp.uint32(1)).astype(jnp.float32) * INT_SCALE
