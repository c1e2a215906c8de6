"""Capture an xplane trace of the fused MIS-PT pass and print the top HLO
ops by self-time (tensorboard_plugin_profile parses the xspace).

Usage: python scripts/xprof_pass.py [tile_log2=15] [n_iters=16]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hydracore3_tpu.scene import build as SB
from hydracore3_tpu import render as R
from hydracore3_tpu.ops import rng as RNG

CORNELL = '/root/reference/scenes/test_035/statex_00001.xml'
LOGDIR = '/tmp/xprof_pass'


def main():
    tile_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    N = 1 << tile_log2
    scene, meta = SB.load_scene(CORNELL, width=1024, height=768)
    pix = jnp.arange(N, dtype=jnp.int32)
    rng = RNG.gen_init(pix)

    f = jax.jit(lambda r, p, k: R._render_tile.__wrapped__(
        scene, meta, r, p, 2, 0, 4, k))
    fb, rng = f(rng, pix, jnp.int32(n_iters))
    jax.block_until_ready((fb, rng))

    os.system(f'rm -rf {LOGDIR}')
    with jax.profiler.trace(LOGDIR):
        for _ in range(3):
            fb, rng = f(rng, pix, jnp.int32(n_iters))
        jax.block_until_ready((fb, rng))

    paths = glob.glob(f'{LOGDIR}/**/*.xplane.pb', recursive=True)
    print('xplane files:', paths, flush=True)
    if not paths:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(paths, 'framework_op_stats^', {})
    import csv
    import io
    # data is CSV text for framework_op_stats
    out = data.decode() if isinstance(data, bytes) else data
    with open('/tmp/op_stats.csv', 'w') as fh:
        fh.write(out)
    rows = list(csv.DictReader(io.StringIO(out)))
    key = None
    for cand in ('total_self_time_in_us', 'self_time_us', 'Total self-time (us)',
                 'total_self_time'):
        if rows and cand in rows[0]:
            key = cand
            break
    if key is None and rows:
        print('columns:', list(rows[0].keys()), flush=True)
        return
    rows.sort(key=lambda r: -float(r[key] or 0))
    tot = sum(float(r[key] or 0) for r in rows)
    print(f'total self time: {tot / 1e3:.3f} ms over trace')
    for r in rows[:30]:
        name = (r.get('operation') or r.get('op_name')
                or r.get('Operation') or '?')
        typ = r.get('type') or r.get('category') or ''
        pct = 100 * float(r[key] or 0) / tot
        print(f'  {pct:5.1f}%  {float(r[key]):10.1f} us  {typ:18s} {name[:90]}',
              flush=True)


if __name__ == '__main__':
    main()
