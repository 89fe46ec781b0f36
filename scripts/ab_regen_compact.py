"""In-process A/B: staged tail compaction of the regenerating wavefront
(integrator.REGEN_COMPACT) on the texture/BVH-bound forward scenes.

Motivation (profiled, scripts/trace_scene.py textures): the wavefront's
trip count is max-over-lanes total segments — 126 iterations at B=90k with
27% average occupancy on the textures bench; the packed-atlas texel gather
alone (fusion.3, 0.64 ms/call) ran 126x = 81 ms = 33% of the render.
Compaction bounds every stage's width to ~8x its live population.

RESULT (v5e chip, 2026-08-21, 3 rounds, AFTER the rule-11 cache fix —
the first run of this script measured compact==no-compact exactly
because the flag flip silently reused the cached trace):
  textures  350.8 -> 154.3 ms   (2.27x)
  random    130.3 -> 101.0 ms   (1.29x)
  final     211.9 -> 179.3 ms   (1.18x)
Occupancy ground truth (scripts/probe_regen_occupancy.py, textures):
126 iterations, 28.9% mean occupancy; alive crosses B/8 at iter 49,
B/16 at 60, B/128 at 86 — stages [90000, 12288, 2048] put the 66-iter
tail on 7-44x narrower bodies.  REGEN_COMPACT=True is the default.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

import bench_extra
from another_raytracer_tpu.ops import camera as camera_lib, integrator
from another_raytracer_tpu.ops import render as render_lib

SCENES = ["textures", "random", "final"]


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    fns = {}
    for name in SCENES:
        builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
        scene, cp = builder()
        cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
        for compact in (False, True):
            integrator.REGEN_COMPACT = compact
            # Trace-time flag: drop cached traces or the second variant
            # silently reuses the first's program (learned the hard way —
            # the first run of this A/B measured compact==no-compact
            # exactly because of this).
            render_lib.clear_trace_caches()
            f = jax.jit(lambda s, c, _k=(name, compact): render_lib.render_radiance(
                s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
                samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(scene, cam))
            print(f"compiled {name} compact={compact} in "
                  f"{time.perf_counter()-t0:.1f} s  segments={int(out[1])}")
            fns[(name, compact)] = (f, scene, cam)
    integrator.REGEN_COMPACT = True

    for rnd in range(3):
        for (name, compact), (f, scene, cam) in fns.items():
            t = timeit(f, scene, cam)
            print(f"round {rnd} {name:9s} compact={int(compact)}  "
                  f"{t*1000:8.2f} ms")


if __name__ == "__main__":
    main()
