"""Pass-granular checkpoint/resume (SURVEY.md §5).

The reference has no checkpointing — its nearest affordance is that the
framebuffer is additively accumulated with normalization deferred to save
time (main.cpp:351-363), so passes are restartable *in principle*.  This
module makes that real: the render loop persists (fb accumulator, samples
done, per-tile RNG state) every N passes, and the differentiable-rendering
loop persists (params, opt_state, iteration).  Any JAX pytree of arrays is
supported; storage is a single .npz (atomic rename on save).
"""
from __future__ import annotations

import io
import json
import os

import jax
import numpy as np


def save_checkpoint(path: str, pytree, step: int = 0, meta: dict = None):
    """Atomically write a pytree checkpoint; `step` is the pass/iter count."""
    leaves, treedef = jax.tree_util.tree_flatten(pytree)
    payload = {f'leaf_{i}': np.asarray(x) for i, x in enumerate(leaves)}
    payload['__step__'] = np.asarray(step, np.int64)
    header = dict(n_leaves=len(leaves), treedef=str(treedef),
                  meta=meta or {})
    payload['__header__'] = np.frombuffer(
        json.dumps(header).encode(), np.uint8)
    buf = io.BytesIO()
    np.savez(buf, **payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(buf.getvalue())
    os.replace(tmp, path)


def load_checkpoint(path: str, like=None):
    """Returns (pytree, step, meta).  ``like``: an example pytree giving the
    structure to unflatten into (required for non-list structures)."""
    with np.load(path) as z:
        header = json.loads(bytes(z['__header__'].tobytes()).decode())
        step = int(z['__step__'])
        leaves = [z[f'leaf_{i}'] for i in range(header['n_leaves'])]
    if like is not None:
        treedef = jax.tree_util.tree_structure(like)
        tree = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        tree = leaves
    return tree, step, header.get('meta', {})
