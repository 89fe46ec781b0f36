"""In-process A/B: samples_per_pass (ray batch size) for the bench workload.

Bigger batches amortize per-kernel overheads and scan trip counts; the limit
is HBM for differentiable-scan residuals (B x depth).  Interleaved in one
process (dispatch variance across processes is ~±15%).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib, render as render_lib

W, H, SPP, DEPTH = 360, 270, 16, 8


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

    fns = {}
    for spass in (1, 2, 4):
        fns[spass] = (
            jax.jit(lambda s, c, _sp=spass: render_lib.render_radiance(
                s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=_sp,
                max_depth=DEPTH, t_min=1e-3, differentiable=False)),
            jax.jit(lambda p, s, c, t, _sp=spass: jax.value_and_grad(diff.render_loss)(
                p, s, c, t, seed, width=W, height=H, spp=SPP,
                samples_per_pass=_sp, max_depth=DEPTH, t_min=1e-3)),
        )
        jax.block_until_ready(fns[spass][0](scene, cam))
        jax.block_until_ready(fns[spass][1](params, scene, cam, target))

    for rnd in range(2):
        for spass, (fwd, g) in fns.items():
            tf = timeit(fwd, scene, cam)
            tg = timeit(g, params, scene, cam, target)
            print(f"round {rnd} spass={spass:2d}  fwd {tf*1000:7.2f} ms   fwd+bwd {tg*1000:7.2f} ms")


if __name__ == "__main__":
    main()
