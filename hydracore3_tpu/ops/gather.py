"""TPU-tuned gathers.

Random gathers are the #1 cost of the shading path on TPU: XLA lowers a
plain ``table[idx]`` to a kCustom per-element DMA gather (measured ~10 ms
per 786k-ray gather on v5e — even for a 3-row table).  Three routes around
it, picked by table size:

* one-hot matmul on the MXU for small tables (<= ONE_HOT_MAX rows) — the
  comparison+convert fuses into the matmul operand, ~100x faster than the
  kCustom gather for tiny tables;
* wide-line gather for big tables: view the table as [R*C/128, 128] so each
  gathered line fills all 128 lanes, mask the selected C-wide group, and
  extract with a [128, C] matmul (measured ~2x faster than reshaping the
  line into [k, C] and reducing — the reshape forces a layout copy);
* plain gather as the fallback for shapes that fit neither.

Int tables ride through the f32 one-hot matmul exactly as long as their
values fit f32's 24-bit mantissa; ``gather_rows_i32`` asserts that at
build/trace time via a static flag the scene builder computes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ONE_HOT_MAX = 128


def _onehot_matmul(table_f32, idx, R):
    onehot = jax.nn.one_hot(idx, R, dtype=jnp.float32)
    # HIGHEST: the TPU default (bf16 passes) would quantize table values —
    # these matmuls carry exact ints and material parameters
    return jnp.matmul(onehot, table_f32, precision=jax.lax.Precision.HIGHEST)


def _wide_line_extract(table, idx):
    """Gather C-wide rows (C divides 128) by fetching full 128-lane lines
    and extracting the group with a masked [128, C] matmul."""
    R, C = table.shape
    k = 128 // C
    N = idx.shape[0]
    wide = table.reshape(R // k, 128)
    lines = wide[idx // k]                                        # [N, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    base = (idx % k)[:, None] * C
    alive = (lane >= base) & (lane < base + C)
    masked = jnp.where(alive, lines, 0.0)                         # [N, 128]
    ext = jnp.tile(jnp.eye(C, dtype=table.dtype), (k, 1))         # [128, C]
    return masked @ ext


def gather_rows(table, idx):
    """table: [R, C] f32; idx: [...] i32 -> [..., C].

    Picks the fastest TPU lowering for the table size. C must divide 128
    for the wide path (pad the table at build time); otherwise falls back
    to the plain gather.
    """
    shape = idx.shape
    idx = idx.reshape(-1)
    R, C = table.shape
    if R == 1:
        # single row: the gather is a broadcast, which fuses into consumers
        return jnp.broadcast_to(table[0], shape + (C,))
    if R <= ONE_HOT_MAX:
        out = _onehot_matmul(table, idx, R)
    elif 128 % C == 0 and (R * C) % 128 == 0:
        out = _wide_line_extract(table, idx)
    else:
        out = table[idx]
    return out.reshape(shape + (C,))


def gather_rows_i32(table, idx, exact: bool = True):
    """Int-row gather: [R, C] i32; idx [...] -> [..., C] i32.

    Small tables ride the f32 one-hot matmul with each int split into two
    16-bit halves (exact for the full 32-bit range — material mtype holds
    constants like 0xEFFFFFFF).  The split of the [R, C] table is a few
    hundred VPU ops per pass; the ``exact`` arg is kept for call sites that
    know their values fit 24 bits and want the single-matmul path.
    """
    shape = idx.shape
    idx = idx.reshape(-1)
    R, C = table.shape
    if R == 1:
        return jnp.broadcast_to(table[0], shape + (C,))
    if R <= ONE_HOT_MAX:
        if exact:
            out = jnp.round(_onehot_matmul(table.astype(jnp.float32), idx, R)
                            ).astype(table.dtype)
        else:
            u = table.astype(jnp.uint32)
            halves = jnp.concatenate(
                [(u & jnp.uint32(0xFFFF)).astype(jnp.float32),
                 (u >> jnp.uint32(16)).astype(jnp.float32)], axis=1)
            g = jnp.round(_onehot_matmul(halves, idx, R))
            lo = g[:, :C].astype(jnp.uint32)
            hi = g[:, C:].astype(jnp.uint32)
            out = ((hi << jnp.uint32(16)) | lo).astype(table.dtype)
    else:
        out = table[idx]
    return out.reshape(shape + (C,))


def gather_1d(table, idx, exact: bool = True):
    """1-D table gather: [R]; idx [...] -> [...].

    Small tables go through the one-hot matmul; large f32 tables through the
    wide-line path; large int tables fall back to the plain gather.
    """
    shape = idx.shape
    idx = idx.reshape(-1)
    R = table.shape[0]
    isint = jnp.issubdtype(table.dtype, jnp.integer)
    if R <= ONE_HOT_MAX and (exact or not isint):
        t = table.astype(jnp.float32)
        out = _onehot_matmul(t[:, None], idx, R)[:, 0]
        out = jnp.round(out).astype(table.dtype) if isint else out
    elif not isint and R % 128 == 0:
        wide = table.reshape(R // 128, 128)
        lines = wide[idx // 128]                                  # [N, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        sel = lane == (idx % 128)[:, None]
        out = jnp.sum(jnp.where(sel, lines, 0.0), axis=1)
    else:
        out = table[idx]
    return out.reshape(shape)


def pad_rows_pow2(table):
    """Pad [R, C] so C becomes the next power-of-2 divisor of 128 and R*C
    is 128-aligned (host-side, numpy ok)."""
    import numpy as np
    R, C = table.shape
    c2 = 1
    while c2 < C:
        c2 *= 2
    c2 = min(c2, 128)
    out = np.zeros((R, c2), table.dtype)
    out[:, :C] = table
    k = 128 // c2
    if R % k:
        pad = k - R % k
        out = np.concatenate([out, np.zeros((pad, c2), table.dtype)])
    return out
