"""In-process A/B: fused differentiable path for the BVH'd-sphere class
(round-5 widening #2 — accel megakernel primal + large-T replay backward)
vs XLA autodiff through the lockstep scan, on the random-scene grad step.

Timing note: rule 13 — walls on grad-sized outputs can lie; each arm also
fetches the loss value to force completion, and the final numbers should
be read against the recorded XLA-path row (random_grad, 261 ms).

Usage: python scripts/ab_fused_random.py
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
from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops.pallas import mega_diff


def main():
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["random"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    params, _ = diff.split_params(scene)  # DEFAULT_TRAINABLE (fused-safe)
    target = jnp.zeros((W * H, 3), jnp.float32)

    fns, vals = {}, {}
    for arm, fused in (("xla", False), ("fused", None)):
        mega_diff.FUSED_DIFF = fused
        render_lib.clear_trace_caches()
        step = jax.jit(lambda p, s, c, t, _a=arm:
                       jax.value_and_grad(diff.render_loss)(
                           p, s, c, t, jnp.uint32(0), width=W, height=H,
                           spp=SPP, samples_per_pass=1, max_depth=DEPTH,
                           t_min=1e-3))
        t0 = time.perf_counter()
        loss, grads = step(params, scene, cam, target)
        jax.block_until_ready(grads)
        print(f"{arm:5s} compiled in {time.perf_counter()-t0:.1f} s"
              f"  loss={float(loss):.6f}")
        fns[arm] = step
        vals[arm] = (float(loss), jax.tree.map(np.asarray, grads))
    mega_diff.FUSED_DIFF = None
    render_lib.clear_trace_caches()

    gl, gk = vals["xla"][1], vals["fused"][1]
    worst = 0.0
    for k in gl:
        scale = max(np.abs(gl[k]).max(), 1e-9)
        worst = max(worst, float(np.abs(gl[k] - gk[k]).max() / scale))
    print(f"loss delta {abs(vals['xla'][0]-vals['fused'][0]):.2e} "
          f"(megakernel-primal ulp class), worst relative grad delta "
          f"{worst:.2e}")

    results = {a: [] for a in fns}
    for rnd in range(3):
        for arm, step in fns.items():
            out = step(params, scene, cam, target)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(10):
                out = step(params, scene, cam, target)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 10
            results[arm].append(dt)
            print(f"round {rnd} {arm:5s} {dt*1000:8.2f} ms")
    lo = {a: min(v) * 1000 for a, v in results.items()}
    print(f"\nrandom grad: xla {lo['xla']:.2f} ms  fused {lo['fused']:.2f} ms "
          f"({lo['xla']/lo['fused']:.2f}x)")


if __name__ == "__main__":
    main()
