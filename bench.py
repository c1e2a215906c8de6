"""Benchmark: MIS path-tracer throughput — Cornell + sponza-class city.

Prints TWO JSON lines (the driver captures the tail; the LAST line is the
big-scene metric that corresponds to what BASELINE.md actually measures):

  1. Cornell test_035 (the r1-r3 continuity metric; megakernel fast path).
  2. A 262k-triangle synthetic city (hydracore3_tpu/scene/synth.py) — the
     reference's perf ledger is defined on sponza-class scenes of exactly
     this size (testing/perf.txt:2-8); rendered through the HBM-streaming
     Pallas BVH path (accel/traverse_stream.py).

Baselines (BASELINE.md, RTX 4090): test_102 798 ms @ 1024^2x1024spp =
1344 Msamples/s; sponza 2282 ms = 470 Msamples/s.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MSAMPLES = 1344.0
BASELINE_BIG_MSAMPLES = 470.0
CORNELL = '/root/reference/scenes/test_035/statex_00001.xml'


def _count_rays(scene, meta, n_px=1 << 16):
    import jax
    import jax.numpy as jnp
    from hydracore3_tpu.models import integrator_pt as IPT
    from hydracore3_tpu.ops import rng as RNG
    pix = jnp.arange(min(n_px, meta.width * meta.height), dtype=jnp.int32)
    cnt = jax.jit(lambda r: IPT.count_rays_pass(scene, meta, r, pix))(
        RNG.gen_init(pix))
    return float(cnt[0] + cnt[1]) / pix.shape[0]


def bench_cornell():
    from hydracore3_tpu.scene import build as SB
    from hydracore3_tpu import render as R

    width, height = 1024, 768
    spp = int(os.environ.get('BENCH_SPP', '64'))
    scene, meta = SB.load_scene(CORNELL, width=width, height=height)

    tile = 1 << 15  # XLA path: VMEM-resident intermediates (see render.py)
    regen = os.environ.get('BENCH_REGEN', '1') != '0'
    # warmup compiles the SAME executables as the timed run (megakernel
    # unrolls k=16 samples per dispatch: spp=16 warms it)
    R.render(scene, meta, spp=16, integrator='mispt', tile_size=tile,
             regen=regen)

    t0 = time.time()
    out = R.render(scene, meta, spp=spp, integrator='mispt', tile_size=tile,
                   regen=regen, return_timing=True)
    dt = time.time() - t0
    img, timing = out if isinstance(out, tuple) else (out, {})
    samples = timing.get('samples', width * height * spp)
    msamples_s = samples / dt / 1e6
    rays_per_sample = _count_rays(scene, meta)
    print(json.dumps({
        'metric': 'mis_pt_cornell_throughput',
        'value': round(msamples_s, 2),
        'unit': 'Msamples/s',
        'vs_baseline': round(msamples_s / BASELINE_MSAMPLES, 4),
        'mrays_per_s': round(msamples_s * rays_per_sample, 2),
        'rays_per_sample': round(rays_per_sample, 3),
    }), flush=True)


def bench_city():
    from hydracore3_tpu.scene import synth
    from hydracore3_tpu import render as R

    spp = int(os.environ.get('BENCH_BIG_SPP', '4'))
    # textured=True: procedural facades + asphalt + env sky map, so the
    # bench carries sponza-class SHADING load (BASELINE.md rows 2-3 are
    # textured), not just sponza-class geometry (VERDICT r4 item 3)
    scene, meta = synth.city_scene(width=1024, height=1024, depth=5,
                                   textured=True)
    assert meta.use_stream, 'city must route through the streamed BVH'

    # whole-image tiles (1M rays in flight): denser cell population after
    # the per-bounce ray sort keeps shrinking march flushes/ray — the
    # density ladder measured 0.080 / 0.172 / 0.245 / 0.291 Ms/s at
    # 32k / 131k / 524k / 1M rays per pass (docs/PERF_NOTES.md r5)
    tile = 1 << 20
    R.render(scene, meta, spp=1, integrator='mispt', tile_size=tile)

    t0 = time.time()
    R.render(scene, meta, spp=spp, integrator='mispt', tile_size=tile)
    dt = time.time() - t0
    samples = 1024 * 1024 * spp
    msamples_s = samples / dt / 1e6
    rays_per_sample = _count_rays(scene, meta)
    print(json.dumps({
        'metric': 'mis_pt_city262k_throughput',
        'value': round(msamples_s, 3),
        'unit': 'Msamples/s',
        'vs_baseline': round(msamples_s / BASELINE_BIG_MSAMPLES, 5),
        'mrays_per_s': round(msamples_s * rays_per_sample, 2),
        'rays_per_sample': round(rays_per_sample, 3),
        'tris': int(meta.num_tris),
    }), flush=True)


def main():
    bench_cornell()
    if os.environ.get('BENCH_BIG', '1') != '0':
        bench_city()


if __name__ == '__main__':
    main()
