"""In-process A/B: lax.scan unroll factors for the differentiable path.

The backward's dominant cost is residual stacking via dynamic_update_slice:
each scan step DUSes [1, B] rows into [steps, B] buffers — an 8x write
amplification ((8,128) tile read-modify-write).  Unrolled scan steps write
thicker slabs.  Grid: bounce-scan unroll x chunk-scan unroll.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 1


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)

    grids = [(8, 2), (8, 4), (8, 8)]
    fns = {}
    for bu, cu in grids:
        fns[(bu, cu)] = jax.jit(lambda p, s, c, t, _b=bu, _c=cu: jax.value_and_grad(
            diff.render_loss)(
            p, s, c, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3,
            unroll=_b, chunk_unroll=_c))
        t0 = time.perf_counter()
        jax.block_until_ready(fns[(bu, cu)](params, scene, cam, target))
        print(f"compiled unroll={bu} chunk_unroll={cu} in {time.perf_counter()-t0:.0f}s",
              flush=True)

    for rnd in range(2):
        for (bu, cu), g in fns.items():
            tg = timeit(g, params, scene, cam, target)
            print(f"round {rnd} unroll={bu} chunk_unroll={cu:2d}  "
                  f"fwd+bwd {tg*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
