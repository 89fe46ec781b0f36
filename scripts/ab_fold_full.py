"""In-process A/B: FULL in-kernel winner-record fold
(intersect.FOLD_FULL_RECORD — tu/tv/mat folded at leaf-test time, zero
shading-stage record gathers) vs the partial (n,u,v) fold on the
capsule-mesh bench.

Round-5 bench-size profile (720x540, 476 ms wall / 310 ms device): the
remaining [N,8] row gather (15 ms) + 6-col unpack (45 ms) + mat convert
(8 ms) = 68 device-ms; the full fold trades them for ~6 multiply-adds +
3 selects per leaf test inside the 122 ms packet kernel.

Usage: python scripts/ab_fold_full.py [--iters N] [--scene mesh]
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
from another_raytracer_tpu.ops import color as color_lib
from another_raytracer_tpu.ops import render as render_lib, vec3

ARMS = ("nofold", "partial", "full")


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def set_arm(arm):
    intersect.FOLD_TRI_RECORD = arm != "nofold"
    intersect.FOLD_FULL_RECORD = arm == "full"
    render_lib.clear_trace_caches()


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    name = "mesh"
    if "--scene" in sys.argv:
        name = sys.argv[sys.argv.index("--scene") + 1]
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    fns, images = {}, {}
    for arm in ARMS:
        set_arm(arm)
        f = jax.jit(lambda s, c, _k=arm: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"compiled {arm:8s} in {time.perf_counter()-t0:.1f} s"
              f"  segments={int(segs)}")
        fns[arm] = f
        images[arm] = (np.asarray(color_lib.to_uint8(vec3.to_numpy(acc), SPP)),
                       int(segs))
    set_arm("full")

    a, sa = images["nofold"]
    for arm in ("partial", "full"):
        b, sb = images[arm]
        close = (np.abs(a.astype(np.int32) - b.astype(np.int32)) <= 2).all(-1)
        print(f"VALIDATE {arm}: {close.mean():.4%} pixels within 2/255, "
              f"segments drift {abs(sa-sb)/max(sa,1):.4%}")

    results = {arm: [] for arm in ARMS}
    for rnd in range(3):
        for arm, f in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results[arm].append(t)
            print(f"round {rnd} {arm:8s}  {t*1000:8.2f} ms")
    best = {arm: min(v) * 1000 for arm, v in results.items()}
    print(f"\n{name}: nofold {best['nofold']:.2f} ms  partial "
          f"{best['partial']:.2f} ms  full {best['full']:.2f} ms "
          f"({best['nofold']/best['full']:.2f}x vs nofold, "
          f"{best['partial']/best['full']:.2f}x vs partial)")


if __name__ == "__main__":
    main()
