"""In-process A/B: axis/identity-grouped rect sweep vs generic sweep.

The builder orders rects [ident axis0 | ident axis1 | ident axis2 | rest];
scene.rect_ident_counts=() forces the old generic per-element
transform+select sweep on identical data.  Cornell: 18 rects = 6 identity
walls/light + 12 transformed box faces.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib, render as render_lib

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 1


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)
    scene_old = scene.replace(rect_ident_counts=())
    print("groups:", scene.rect_ident_counts, "n_rects:", scene.n_rects)

    def make(s):
        fwd = jax.jit(lambda sc, cc: render_lib.render_radiance(
            sc, cc, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
            max_depth=DEPTH, t_min=1e-3, differentiable=False)).lower(s, cam).compile()
        fb = jax.jit(lambda p, sc, cc, t: jax.value_and_grad(diff.render_loss)(
            p, sc, cc, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3,
        )).lower(params, s, cam, target).compile()
        return fwd, fb

    fwd_o, fb_o = make(scene_old)
    fwd_n, fb_n = make(scene)

    # Identical radiance (grouping is a pure layout change).
    (acc_o, _), (acc_n, _) = fwd_o(scene_old, cam)[0:2], fwd_n(scene, cam)[0:2]
    acc_o, sg_o = fwd_o(scene_old, cam)
    acc_n, sg_n = fwd_n(scene, cam)
    np.testing.assert_allclose(np.asarray(acc_o.x), np.asarray(acc_n.x), rtol=0, atol=0)
    print("radiance identical; segments", int(sg_o), int(sg_n))

    for rep in range(3):
        dtf_o, _ = timeit(fwd_o, scene_old, cam)
        dtf_n, _ = timeit(fwd_n, scene, cam)
        dtb_o, _ = timeit(fb_o, params, scene_old, cam, target)
        dtb_n, _ = timeit(fb_n, params, scene, cam, target)
        print(f"rep{rep}: fwd old {dtf_o*1e3:7.2f} new {dtf_n*1e3:7.2f} | "
              f"fwd+bwd old {dtb_o*1e3:7.2f} new {dtb_n*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
