#!/usr/bin/env python3
"""Xplane trace of ONE textured-city MIS-PT pass (1M-ray tile) and the
top device ops by self-time.  Usage: python scripts/xprof_city.py [spp]"""
import glob
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from hydracore3_tpu.scene import synth
from hydracore3_tpu import render as R

LOGDIR = '/tmp/xprof_city'


def main():
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    scene, meta = synth.city_scene(width=1024, height=1024, depth=5,
                                   textured=True)
    tile = 1 << 20
    # warmup / compile
    R.render(scene, meta, spp=1, integrator='mispt', tile_size=tile)
    os.system(f'rm -rf {LOGDIR}')
    t0 = time.time()
    with jax.profiler.trace(LOGDIR):
        R.render(scene, meta, spp=spp, integrator='mispt', tile_size=tile)
    wall = time.time() - t0
    print(f'wall for {spp} spp @ 1M-ray tiles: {wall*1e3:.0f} ms')
    pb = glob.glob(f'{LOGDIR}/**/*.xplane.pb', recursive=True)
    if pb:
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     'xplane_ops.py'), pb[0], '30'])


if __name__ == '__main__':
    main()
