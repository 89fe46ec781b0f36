"""In-process A/B: shade-time sub-compaction of the packed-atlas texel
fetch (shade.ATLAS_COMPACT) on the textures bench.

Post-perlin-kernel profile (2026-08-21): the atlas gather fusion is
31.5 ms of the 54.5 ms render (58%) — latency-bound random HBM reads at
~7 ns/element (the 2 MB atlas never gets VMEM-scoped).  Cost scales with
element count, so gathering only image-winner lanes (rank-selected into a
B//4 buffer, full-width fallback via lax.cond when they overflow) should
scale it by the image-winner fraction plus compaction overhead.

Usage: python scripts/ab_atlas_compact.py [--iters N]
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
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS["textures"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    fns, accs = {}, {}
    for compact in (False, True):
        shade.ATLAS_COMPACT = compact
        render_lib.clear_trace_caches()
        f = jax.jit(lambda s, c, _k=compact: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"compiled compact={int(compact)} in {time.perf_counter()-t0:.1f} s"
              f"  segments={int(segs)}")
        fns[compact] = f
        accs[compact] = vec3.to_numpy(acc)
    shade.ATLAS_COMPACT = True
    render_lib.clear_trace_caches()
    print("bit-identical radiance:", np.array_equal(accs[False], accs[True]))

    results = {False: [], True: []}
    for rnd in range(3):
        for compact, f in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results[compact].append(t)
            print(f"round {rnd} compact={int(compact)}  {t*1000:8.2f} ms")
    print(f"\ntextures: full {min(results[False])*1000:.2f} ms  "
          f"compact {min(results[True])*1000:.2f} ms  "
          f"speedup {min(results[False])/min(results[True]):.2f}x")


if __name__ == "__main__":
    main()
