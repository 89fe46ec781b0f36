"""In-process A/B: shade.ATLAS_IDX_ZERO — point non-image-winner lanes'
packed-atlas gather at texel 0 (bit-identical output; values discarded by
the kind select).  Probes whether the latency-bound serial gather speeds
up on duplicate addresses.  Scenes: textures (atlas 58% of the bench) and
mesh (atlas ~111 ms of the bench).

Usage: python scripts/ab_atlas_idx0.py [--scene textures|mesh] [--iters N]
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
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import color as color_lib
from another_raytracer_tpu.ops import render as render_lib, shade, vec3


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    names = ["textures", "mesh"]
    if "--scene" in sys.argv:
        names = [sys.argv[sys.argv.index("--scene") + 1]]
    for name in names:
        builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS[name]
        scene, cp = builder()
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        fns, images = {}, {}
        for knob in (False, True):
            shade.ATLAS_IDX_ZERO = knob
            render_lib.clear_trace_caches()
            f = jax.jit(lambda s, c, _k=knob: render_lib.render_radiance(
                s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
                samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
            t0 = time.perf_counter()
            acc, segs = jax.block_until_ready(f(scene, cam))
            print(f"{name} idx0={int(knob)} compiled "
                  f"{time.perf_counter()-t0:.1f} s segs={int(segs)}")
            fns[knob] = f
            images[knob] = np.asarray(
                color_lib.to_uint8(vec3.to_numpy(acc), SPP))
        shade.ATLAS_IDX_ZERO = False
        render_lib.clear_trace_caches()
        same = (images[False] == images[True]).all()
        print(f"{name} VALIDATE bit-identical: {bool(same)}")

        results = {False: [], True: []}
        for rnd in range(3):
            for knob, f in fns.items():
                out = f(scene, cam)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = f(scene, cam)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / iters
                results[knob].append(dt)
                print(f"{name} round {rnd} idx0={int(knob)} {dt*1000:8.2f} ms")
        lo = {k: min(v) * 1000 for k, v in results.items()}
        print(f"\n{name}: off {lo[False]:.2f} ms  idx0 {lo[True]:.2f} ms "
              f"({lo[False]/lo[True]:.2f}x)\n")


if __name__ == "__main__":
    main()
