"""In-process A/B: in-kernel SPHERE winner-record fold
(intersect.FOLD_SPH_RECORD) on the random-scene bench.

The random profile showed the [N,12] winner-row gather + padded column
unpack at ~22 ms of the ~85 ms bench; the fold trades that for ~9 extra
vector ops + 5 selects per leaf test inside the packet kernel (which is
~47% of the bench — the accel-mega neutral warns these folds are not
free).  The bench runs at B=90k, below the production FOLD_RECORD_MIN_B
gate, so this A/B patches the gate to 65536 for BOTH measurement arms'
widths to engage.

Usage: python scripts/ab_fold_sph.py [--iters N]
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


def timeit(fn, *args, iters=3):
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
    name = "random"
    if "--scene" in sys.argv:
        name = sys.argv[sys.argv.index("--scene") + 1]
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    min_b = 65536
    if "--min-b" in sys.argv:
        min_b = int(sys.argv[sys.argv.index("--min-b") + 1])
    intersect.FOLD_SPH_MIN_B = min_b
    fns, images = {}, {}
    for fold in (False, True):
        intersect.FOLD_SPH_RECORD = fold
        render_lib.clear_trace_caches()
        f = jax.jit(lambda s, c, _k=fold: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"compiled fold={int(fold)} in {time.perf_counter()-t0:.1f} s"
              f"  segments={int(segs)}")
        fns[fold] = f
        images[fold] = (np.asarray(color_lib.to_uint8(vec3.to_numpy(acc), SPP)),
                        int(segs))
    intersect.FOLD_SPH_RECORD = True
    render_lib.clear_trace_caches()

    a, sa = images[False]
    b, sb = images[True]
    close = (np.abs(a.astype(np.int32) - b.astype(np.int32)) <= 2).all(-1)
    print(f"VALIDATE: {close.mean():.4%} pixels within 2/255, "
          f"segments drift {abs(sa-sb)/max(sa,1):.4%}")

    results = {False: [], True: []}
    for rnd in range(3):
        for fold, f in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results[fold].append(t)
            print(f"round {rnd} fold={int(fold)}  {t*1000:8.2f} ms")
    print(f"\n{name}: gather {min(results[False])*1000:.2f} ms  "
          f"fold {min(results[True])*1000:.2f} ms "
          f"({min(results[False])/min(results[True]):.2f}x)")


if __name__ == "__main__":
    main()
