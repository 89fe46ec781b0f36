"""In-process A/B: winner-record row-gather unpack via transpose
(intersect.RECORD_T_UNPACK) vs direct column slices, on the random and
mesh benches.

Motivation (round-4 random HLO): the [90000,12] sphere-record row gather
is followed by a slice-unpack fusion at 0.4 ms/call (1.16M estimated
cycles) — slicing one column of a [B,12] T(8,128) buffer reads the full
12->128 lane padding every time; 37 iterations made it 15 ms of the 95 ms
render.  Transposing once to [12,B] makes every column a contiguous [B]
slice.

Usage: python scripts/ab_record_unpack.py [--iters N]
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
from another_raytracer_tpu.ops import camera as camera_lib, intersect
from another_raytracer_tpu.ops import render as render_lib, vec3

SCENES = ["random", "mesh"]


def timeit(fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = 4
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    fns = {}
    for name in SCENES:
        builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
        scene, cp = builder()
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        for tsp in (False, True):
            intersect.RECORD_T_UNPACK = tsp
            render_lib.clear_trace_caches()
            f = jax.jit(lambda s, c, _k=(name, tsp): render_lib.render_radiance(
                s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
                samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
            t0 = time.perf_counter()
            acc, segs = jax.block_until_ready(f(scene, cam))
            print(f"compiled {name} transpose={int(tsp)} in "
                  f"{time.perf_counter()-t0:.1f} s  segments={int(segs)}")
            fns[(name, tsp)] = (f, scene, cam, vec3.to_numpy(acc))
    intersect.RECORD_T_UNPACK = True
    render_lib.clear_trace_caches()

    for name in SCENES:
        a = fns[(name, False)][3]
        b = fns[(name, True)][3]
        print(f"{name}: bit-identical radiance: {np.array_equal(a, b)}")

    results = {}
    for rnd in range(3):
        for (name, tsp), (f, scene, cam, _) in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results.setdefault((name, tsp), []).append(t)
            print(f"round {rnd} {name:7s} transpose={int(tsp)}  {t*1000:8.2f} ms")
    print()
    for name in SCENES:
        t0 = min(results[(name, False)])
        t1 = min(results[(name, True)])
        print(f"{name:7s}: slices {t0*1000:8.2f} ms  transpose {t1*1000:8.2f} ms"
              f"  speedup {t0/t1:5.2f}x")


if __name__ == "__main__":
    main()
