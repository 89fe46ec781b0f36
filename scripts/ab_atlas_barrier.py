"""In-process A/B: fence the packed-atlas texel gather out of its fusion
(shade.ATLAS_BARRIER) on the textures bench.

Motivation: the round-3 trace named the stage-1 gather fusion at
0.64 ms/call x 49 iterations = 30% of the textures render, yet a
standalone 90k-element gather from the same-size table measures ~0.03 ms
(scripts/../tmp experiment, 2026-08-21) — XLA appears to pick a serial
emitter when the gather fuses into the loop body.  optimization_barrier
forces the gather into its own HLO op.

Usage: python scripts/ab_atlas_barrier.py [--iters N]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from another_raytracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

import bench_extra
from another_raytracer_tpu.ops import camera as camera_lib, shade
from another_raytracer_tpu.ops import render as render_lib, vec3


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = 5
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    name = "textures"
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    fns = {}
    accs = {}
    for barrier in (False, True):
        shade.ATLAS_BARRIER = barrier
        render_lib.clear_trace_caches()
        f = jax.jit(lambda s, c, _k=barrier: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"compiled barrier={int(barrier)} in {time.perf_counter()-t0:.1f} s"
              f"  segments={int(segs)}")
        fns[barrier] = f
        accs[barrier] = vec3.to_numpy(acc)
    shade.ATLAS_BARRIER = False
    render_lib.clear_trace_caches()
    # The barrier must not change values at all (same program order).
    same = np.array_equal(accs[False], accs[True])
    print(f"bit-identical radiance: {same}")

    results = {False: [], True: []}
    for rnd in range(3):
        for barrier, f in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results[barrier].append(t)
            print(f"round {rnd} barrier={int(barrier)}  {t*1000:8.2f} ms")
    print(f"\ntextures: no-barrier {min(results[False])*1000:.2f} ms  "
          f"barrier {min(results[True])*1000:.2f} ms  "
          f"speedup {min(results[False])/min(results[True]):.2f}x")


if __name__ == "__main__":
    main()
