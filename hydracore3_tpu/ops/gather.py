"""TPU-tuned row gathers.

Random row gathers are the #1 cost of the shading path on TPU (the VPU
issues ~1 gathered row per ~8 cycles and narrow rows pad to 128 lanes).
Two routes around the naive ``table[idx]``:

* one-hot matmul on the MXU for small tables (<= ONE_HOT_MAX rows);
* wide-row gather for big tables: view the table as [R*C/128, 128] so each
  gathered row fills all 128 lanes, then extract the C-wide slice with a
  small masked reduction.  ~1.7x faster than the narrow gather and the
  extraction fuses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

ONE_HOT_MAX = 128


def gather_rows(table, idx):
    """table: [R, C] f32; idx: [N] i32 -> [N, C].

    Picks the fastest TPU lowering for the table size. C must divide 128
    for the wide path (pad the table at build time); otherwise falls back
    to the plain gather.
    """
    R, C = table.shape
    if R <= ONE_HOT_MAX:
        onehot = jax.nn.one_hot(idx, R, dtype=jnp.float32)
        return onehot @ table
    if 128 % C == 0 and (R * C) % 128 == 0:
        k = 128 // C  # rows per 128-lane line
        wide = table.reshape(R // k, 128)
        lines = wide[idx // k]                       # [N, 128]
        sub = lines.reshape(idx.shape[0], k, C)      # [N, k, C]
        sel = (jnp.arange(k, dtype=jnp.int32)[None, :]
               == (idx % k)[:, None])                # [N, k]
        return jnp.sum(jnp.where(sel[..., None], sub, 0.0), axis=1)
    return table[idx]


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
