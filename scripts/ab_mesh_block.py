"""In-process A/B: packet-kernel block size on the mesh (capsule 720x540)
and final benches.  The random-scene sweep (scripts/ab_random_accel.py)
found block 8192 >> 2048 for incoherent sphere packets; the mesh/planar
defaults (leaf16/blk2048, final leaf48/blk2048) predate that.

Usage: python scripts/ab_mesh_block.py [--iters N]
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

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

CONFIGS = {
    "mesh": (720, 540, 16, 8),
    "final": (240, 180, 8, 8),
}
BLOCKS = [2048, 4096, 8192]


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    iters = 3
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])
    fns = {}
    for name, (W, H, SPP, DEPTH) in CONFIGS.items():
        for block in BLOCKS:
            if name == "mesh":
                scene, cp = library.mesh_scene(bvh_block=block)
            else:
                scene, cp = library.final_scene(bvh_block=block)
            cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
            f = jax.jit(lambda s, c, _k=(name, block): render_lib.render_radiance(
                s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
                samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(scene, cam))
            print(f"compiled {name} blk={block} in {time.perf_counter()-t0:.1f} s")
            fns[(name, block)] = (f, scene, cam)

    results = {}
    for rnd in range(3):
        for key, (f, scene, cam) in fns.items():
            t = timeit(f, scene, cam, iters=iters)
            results.setdefault(key, []).append(t)
            print(f"round {rnd} {key[0]:5s} blk={key[1]:4d}  {t*1000:8.2f} ms")
    print()
    for key in fns:
        print(f"{key[0]:5s} blk={key[1]:4d}: {min(results[key])*1000:8.2f} ms")


if __name__ == "__main__":
    main()
