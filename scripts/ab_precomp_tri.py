"""In-process A/B: host-precomputed triangle leaf-test geometry
(intersect.PRECOMP_TRI — rows cols 17-34) vs in-kernel scalar rederivation
on the capsule-mesh bench.  The packet kernel is 124 of the 385 ms bench;
if the scalar unit is NOT hidden behind the vector work (as the round-2
design assumed), loading 19 precomputed scalars beats recomputing 3
crosses + 4 dots per (triangle, block) visit.

Usage: python scripts/ab_precomp_tri.py [--iters N]
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


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["mesh"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)

    fns, images = {}, {}
    for pre in (False, True):
        intersect.PRECOMP_TRI = pre
        render_lib.clear_trace_caches()
        f = jax.jit(lambda s, c, _k=pre: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        acc, segs = jax.block_until_ready(f(scene, cam))
        print(f"precomp={int(pre)} compiled {time.perf_counter()-t0:.1f} s"
              f"  segs={int(segs)}")
        fns[pre] = f
        images[pre] = (np.asarray(color_lib.to_uint8(vec3.to_numpy(acc), SPP)),
                       int(segs))
    intersect.PRECOMP_TRI = True
    render_lib.clear_trace_caches()

    a, sa = images[False]
    b, sb = images[True]
    close = (np.abs(a.astype(np.int32) - b.astype(np.int32)) <= 2).all(-1)
    print(f"VALIDATE: {close.mean():.4%} pixels within 2/255, "
          f"segments drift {abs(sa-sb)/max(sa,1):.4%}")

    results = {False: [], True: []}
    for rnd in range(3):
        for pre, f in fns.items():
            out = f(scene, cam)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = f(scene, cam)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / iters
            results[pre].append(dt)
            print(f"round {rnd} precomp={int(pre)} {dt*1000:8.2f} ms")
    lo = {k: min(v) * 1000 for k, v in results.items()}
    print(f"\nmesh: rederive {lo[False]:.2f} ms  precomp {lo[True]:.2f} ms "
          f"({lo[False]/lo[True]:.2f}x)")


if __name__ == "__main__":
    main()
