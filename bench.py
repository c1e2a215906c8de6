"""Benchmark: MIS path-tracer throughput on the Cornell scene (test_035).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline derivation (BASELINE.md): the reference renders test_102 (mirror
Cornell) 1024x1024 @ 1024 spp in 798 ms on an RTX 4090 ~= 1344 Msamples/s
(camera paths per second).  We measure the same quantity — completed camera
samples per second, full MIS estimator with NEE shadow rays — on one TPU
chip and report vs that number.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSAMPLES = 1344.0
CORNELL = '/root/reference/scenes/test_035/statex_00001.xml'


def main():
    from hydracore3_tpu.scene import build as SB
    from hydracore3_tpu import render as R

    width, height = 1024, 768
    spp = int(os.environ.get('BENCH_SPP', '64'))
    scene, meta = SB.load_scene(CORNELL, width=width, height=height)

    tile = 1 << 15  # XLA path: VMEM-resident intermediates (see render.py)
    # regeneration mode (megakernel persistent samples): dead lanes re-init
    # the pixel's next sample immediately, so throughput counts ACTUAL
    # completed camera samples (reported by return_timing['samples'])
    regen = os.environ.get('BENCH_REGEN', '1') != '0'
    # warmup + compile with the SAME executables as the timed run (the
    # megakernel path unrolls k=16 samples per dispatch: spp=16 warms it)
    R.render(scene, meta, spp=16, integrator='mispt', tile_size=tile,
             regen=regen)

    t0 = time.time()
    out = R.render(scene, meta, spp=spp, integrator='mispt', tile_size=tile,
                   regen=regen, return_timing=True)
    dt = time.time() - t0
    img, timing = out if isinstance(out, tuple) else (out, {})
    samples = timing.get('samples', width * height * spp)
    msamples_s = samples / dt / 1e6

    # direct ray-count instrumentation (BASELINE.md:20): rays actually
    # traced per camera sample (nearest + NEE shadow), counted on-device
    import jax, jax.numpy as jnp
    from hydracore3_tpu.models import integrator_pt as IPT
    from hydracore3_tpu.ops import rng as RNG
    n_px = min(1 << 16, width * height)
    pix = jnp.arange(n_px, dtype=jnp.int32)
    cnt = jax.jit(lambda r: IPT.count_rays_pass(scene, meta, r, pix))(
        RNG.gen_init(pix))
    rays_per_sample = float(cnt[0] + cnt[1]) / n_px
    mrays_s = msamples_s * rays_per_sample

    print(json.dumps({
        'metric': 'mis_pt_cornell_throughput',
        'value': round(msamples_s, 2),
        'unit': 'Msamples/s',
        'vs_baseline': round(msamples_s / BASELINE_MSAMPLES, 4),
        'mrays_per_s': round(mrays_s, 2),
        'rays_per_sample': round(rays_per_sample, 3),
    }))


if __name__ == '__main__':
    main()
