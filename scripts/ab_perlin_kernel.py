"""In-process A/B: Pallas perlin kernel (ops/pallas/perlin_kernel.py) vs
the one-hot Lookup formulation, on the perlin-textured bench scenes.

Motivation (round-4 HLO read of the textures program): the 11 perlin
Lookup dot_generals each materialize a [B,256] f32 one-hot to HBM and run
on a VPU convolution emitter at ~89 us/call — 48 ms of the 102 ms
textures render.  The kernel replaces them with in-register lane gathers.

Usage: python scripts/ab_perlin_kernel.py [scene ...] [--iters N]
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
from another_raytracer_tpu.ops import camera as camera_lib, color as color_lib
from another_raytracer_tpu.ops import render as render_lib, vec3
from another_raytracer_tpu.ops.pallas import perlin_kernel

SCENES = ["textures", "final"]


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
    argv = sys.argv[1:]
    if "--iters" in argv:
        k = argv.index("--iters")
        iters = int(argv[k + 1])
        argv = argv[:k] + argv[k + 2:]
    names = [a for a in argv if not a.startswith("--")] or SCENES

    fns = {}
    images = {}
    for name in names:
        builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
        scene, cp = builder()
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        for kern in (False, True):
            perlin_kernel.PERLIN_KERNEL = kern
            render_lib.clear_trace_caches()
            f = jax.jit(lambda s, c, _k=(name, kern): render_lib.render_radiance(
                s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
                samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
            t0 = time.perf_counter()
            acc, segs = jax.block_until_ready(f(scene, cam))
            print(f"compiled {name} kernel={int(kern)} in "
                  f"{time.perf_counter()-t0:.1f} s  segments={int(segs)}")
            fns[(name, kern)] = (f, scene, cam)
            images[(name, kern)] = (
                np.asarray(color_lib.to_uint8(vec3.to_numpy(acc), SPP)),
                int(segs))
        perlin_kernel.PERLIN_KERNEL = None
        render_lib.clear_trace_caches()

        a, sa = images[(name, False)]
        b, sb = images[(name, True)]
        close = (np.abs(a.astype(np.int32) - b.astype(np.int32)) <= 2).all(-1)
        print(f"VALIDATE {name}: {close.mean():.4%} pixels within 2/255, "
              f"segments drift {abs(sa-sb)/max(sa,1):.4%}")

    results = {}
    for rnd in range(3):
        for (name, kern), (f, scene, cam) in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results.setdefault((name, kern), []).append(t)
            print(f"round {rnd} {name:9s} kernel={int(kern)}  {t*1000:8.2f} ms")

    print()
    for name in names:
        t0 = min(results[(name, False)])
        t1 = min(results[(name, True)])
        _, segs = images[(name, True)]
        print(f"{name:9s}: lookup {t0*1000:7.2f} ms  kernel {t1*1000:7.2f} ms  "
              f"speedup {t0/t1:5.2f}x  kernel {segs/t1/1e6:7.1f} Mrays/s")


if __name__ == "__main__":
    main()
