"""In-process A/B: shade-stage remat now that shading is ~40% cheaper.

Backward-pass residual stacking (dynamic_update_slice) measures ~33% of the
bwd module (scripts/trace_probe.py).  jax.checkpoint on shade_hit trades
that traffic for a recompute whose cost dropped since the last A/B (fused
emit+scatter, threefry-13), so re-measure at the bench config (spass=1).
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

    def make(remat):
        return jax.jit(lambda p, s, c, t: jax.value_and_grad(diff.render_loss)(
            p, s, c, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3, remat=remat,
        )).lower(params, scene, cam, target).compile()

    fb = {False: make(False), True: make(True)}
    for rep in range(3):
        a = timeit(fb[False], params, scene, cam, target)
        b = timeit(fb[True], params, scene, cam, target)
        print(f"rep{rep}: fwd+bwd remat=False {a*1e3:7.2f} ms   remat=True {b*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
