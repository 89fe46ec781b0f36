"""In-process A/B: Lookup dense matmul as manual 3-pass bf16 table split vs
precision=HIGHEST (6 passes).  Both bit-exact; the split halves the MXU
operand streaming.  Measures the texture-heavy scene (Perlin one-hots
dominate), the final scene, and the Cornell fwd+bwd headline.

RESULT (v5e, 2026-08-21, AFTER the rule-11 trace-cache fix): HIGHEST wins —
textures 126 vs 178 ms, final 186 vs 204, cornell f+b 51.4 vs 50.1 (~equal).
The first run of this script picked the split, but its forward timings
compared one cached program against itself.  SPLIT_TABLE defaults False."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

import bench_extra
from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import gather
from another_raytracer_tpu.ops import render as render_lib


def fwd_fn(name):
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    return lambda: jax.block_until_ready(f(scene, cam))


def cornell_step():
    W, H, SPP, DEPTH = 360, 270, 16, 8
    scene, cp = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)
    step = jax.jit(lambda p, s, c, t: jax.value_and_grad(diff.render_loss)(
        p, s, c, t, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    return lambda: jax.block_until_ready(step(params, scene, cam, target)[1])


def main():
    fns = []
    for split in (True, False):
        gather.SPLIT_TABLE = split
        render_lib.clear_trace_caches()  # trace-time flag (CLAUDE.md rule 11)
        for name, mk in (("textures", lambda: fwd_fn("textures")),
                         ("final", lambda: fwd_fn("final")),
                         ("cornell f+b", cornell_step)):
            t0 = time.perf_counter()
            f = mk()
            f()
            print(f"split={split} {name}: compile+first "
                  f"{time.perf_counter()-t0:.0f}s", flush=True)
            fns.append((f"split={int(split)} {name}", f))

    for rnd in range(3):
        for label, f in fns:
            t0 = time.perf_counter()
            for _ in range(3):
                f()
            print(f"round {rnd} {label}: "
                  f"{(time.perf_counter()-t0)/3*1000:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
