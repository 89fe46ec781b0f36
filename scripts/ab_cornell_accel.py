"""In-process A/B: Cornell winner search via the [B,18] sweep (current
default) vs forced BVH accel (6 identity wall rects -> native rect tree
via the Pallas packet kernel; 12 transformed box rects -> 24 world quads
in the planar tree).

The sweep+argmin fusion is the top trace term of the headline bench (~43%
of forward, CLAUDE.md).  The packet kernel lays rays on lanes and loops
rows in the scalar unit, so it never materializes the [B, 128]-padded
candidate arrays the sweep does — a genuinely different hardware path from
the layout/grouping/argmin experiments already recorded negative (rules
5/9/10).  Interleaved in one process (rule 10).

RESULT (v5e chip, 2026-08-21, 3 rounds): NEGATIVE — the sweep wins big.
  sweep  fwd ~20.1 ms   fwd+bwd ~26.4 ms
  accel  fwd ~32.9 ms   fwd+bwd ~37.7 ms   (+65% / +43%)
At N=18 the two packet-kernel launches per bounce (rect tree + planar
quad tree) cost far more than the single fused [B,18] sweep+argmin —
per-call kernel overhead and the lost sweep/shade fusion dominate any
materialization savings.  Radiance max-diff ~10 on an spp-16 SUM is the
usual divergent-path effect (winner t ulp differences reroute the RNG),
same class as the recorded tonemap agreement stats.  Keep the sweep for
small N; accel thresholds (64) stay as they are.
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
    cases = {
        "sweep": library.cornell_box(),
        "accel": library.cornell_box(rect_bvh=True, bvh=True),
    }
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cases["sweep"][1])
    seed = jnp.uint32(0)
    target = jnp.zeros((W * H, 3), jnp.float32)

    fns = {}
    imgs = {}
    for name, (scene, _) in cases.items():
        params, _rest = diff.split_params(scene)
        fwd = jax.jit(lambda s, c: render_lib.render_radiance(
            s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=1,
            max_depth=DEPTH, t_min=1e-3, differentiable=False))
        g = jax.jit(lambda p, s, c, t: jax.value_and_grad(diff.render_loss)(
            p, s, c, t, seed, width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        imgs[name] = jax.block_until_ready(fwd(scene, cam))
        jax.block_until_ready(g(params, scene, cam, target))
        fns[name] = (fwd, g, scene, params)

    ra, rb = imgs["sweep"][0], imgs["accel"][0]
    d = max(float(jnp.max(jnp.abs(getattr(ra, c) - getattr(rb, c))))
            for c in ("x", "y", "z"))
    print(f"max |radiance diff| sweep vs accel: {d:.3e}")

    for rnd in range(3):
        for name, (fwd, g, scene, params) in fns.items():
            tf = timeit(fwd, scene, cam)
            tg = timeit(g, params, scene, cam, target)
            print(f"round {rnd} {name:6s}  fwd {tf*1000:7.2f} ms   "
                  f"fwd+bwd {tg*1000:7.2f} ms")


if __name__ == "__main__":
    main()
