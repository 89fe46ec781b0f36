"""Backward-pass experiment: residual-storing scan vs full-bounce remat.

The differentiable integrator scans over bounces; by default XLA stores each
bounce's residuals for the backward sweep (HBM traffic), with remat it
recomputes the bounce instead (FLOPs).  Times both on the Cornell bench
workload to pick the default.
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

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 4


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:9.2f} ms")
    return dt


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)
    seed = jnp.uint32(0)

    for remat in (False, True):
        g = jax.jit(lambda p, s, c, t, _r=remat: jax.value_and_grad(diff.render_loss)(
            p, s, c, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3, remat=_r))
        timeit(f"fwd+bwd remat={remat}", g, params, scene, cam, target)


if __name__ == "__main__":
    main()
