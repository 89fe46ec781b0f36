"""In-process A/B: Perlin evaluation on the DIFFERENTIABLE path for
geometry-free trainable sets (shade.noise_value_only) — forward Pallas
kernel (value-only, stop_gradient) vs the one-hot Lookup formulation
whose [B,256] one-hots were measured at ~48 ms on the textures bench.

Grad step: value_and_grad(render_loss) with trainable=DEFAULT_TRAINABLE
(shading-only — the class the gate serves).  Wall timing here is subject
to rule 13; the loss value is fetched each rep to force completion.

Usage: python scripts/ab_noise_diff.py [--scene textures|final]
"""

import contextlib
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
from another_raytracer_tpu.ops import shade as shade_lib


def main():
    names = ["textures", "final"]
    if "--scene" in sys.argv:
        names = [sys.argv[sys.argv.index("--scene") + 1]]
    for name in names:
        builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS[name]
        scene, cp = builder()
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        params, _ = diff.split_params(scene)  # DEFAULT_TRAINABLE
        target = jnp.zeros((W * H, 3), jnp.float32)

        real_ctx = shade_lib.noise_value_only
        fns, vals = {}, {}
        for arm in ("lookup", "kernel"):
            # The lookup arm neutralizes the gate (render.radiance_batch
            # enters shade.noise_value_only around the diff trace).
            shade_lib.noise_value_only = (
                real_ctx if arm == "kernel"
                else (lambda flag: contextlib.nullcontext()))
            render_lib.clear_trace_caches()
            step = jax.jit(lambda p, s, c, t, _a=arm:
                           jax.value_and_grad(diff.render_loss)(
                               p, s, c, t, jnp.uint32(0), width=W, height=H,
                               spp=SPP, samples_per_pass=1, max_depth=DEPTH,
                               t_min=1e-3))
            t0 = time.perf_counter()
            loss, grads = step(params, scene, cam, target)
            jax.block_until_ready(grads)
            print(f"{name} {arm:7s} compiled in {time.perf_counter()-t0:.1f} s"
                  f"  loss={float(loss):.6f}")
            fns[arm] = step
            vals[arm] = (float(loss),
                         jax.tree.map(np.asarray, grads))
        shade_lib.noise_value_only = real_ctx
        render_lib.clear_trace_caches()

        gl, gk = vals["lookup"][1], vals["kernel"][1]
        worst = 0.0
        for k in gl:
            scale = max(np.abs(gl[k]).max(), 1e-9)
            worst = max(worst, float(np.abs(gl[k] - gk[k]).max() / scale))
        print(f"{name}: loss delta {abs(vals['lookup'][0]-vals['kernel'][0]):.2e}, "
              f"worst relative grad delta {worst:.2e}")

        results = {a: [] for a in fns}
        for rnd in range(3):
            for arm, step in fns.items():
                out = step(params, scene, cam, target)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                for _ in range(5):
                    out = step(params, scene, cam, target)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / 5
                results[arm].append(dt)
                print(f"{name} round {rnd} {arm:7s} {dt*1000:8.2f} ms")
        lo = {a: min(v) * 1000 for a, v in results.items()}
        print(f"\n{name}: lookup {lo['lookup']:.2f} ms  kernel "
              f"{lo['kernel']:.2f} ms ({lo['lookup']/lo['kernel']:.2f}x)\n")


if __name__ == "__main__":
    main()
