"""In-process A/B of packet-kernel block/leaf size on the FINAL scene.

The final scene's bounce rays are incoherent (mist scattering), so packet
blocks tend to traverse the union of their lanes' needs; a smaller block
unions fewer rays and may cull more, at the cost of more grid programs.
Rule 10: all variants timed interleaved in ONE process.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

W, H, SPP, DEPTH = 240, 180, 8, 8
VARIANTS = [  # (label, build kwargs)
    ("blk2048/leaf16", dict(bvh_block=2048, bvh_leaf_size=16)),
    ("blk1024/leaf16", dict(bvh_block=1024, bvh_leaf_size=16)),
    ("blk2048/leaf32", dict(bvh_block=2048, bvh_leaf_size=32)),
]


def main():
    fns = []
    for label, kw in VARIANTS:
        scene, cp = library.final_scene(**kw)
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        f = jax.jit(lambda s, c: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(scene, cam))
        print(f"{label}: compile+first {time.perf_counter()-t0:.0f}s, "
              f"segments={int(out[1])}")
        fns.append((label, f, scene, cam))

    for rnd in range(3):
        for label, f, scene, cam in fns:
            t0 = time.perf_counter()
            for _ in range(3):
                out = f(scene, cam)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 3
            print(f"round {rnd} {label}: {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()
