"""Profiler trace of any bench_extra scene config: python scripts/trace_scene.py <name>"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import trace_probe
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib


def main():
    import bench_extra

    name = sys.argv[1]
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
    trace_probe.LOGDIR = f"/tmp/artpu_trace_{name}"
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    jax.block_until_ready(f(scene, cam))
    jax.profiler.start_trace(trace_probe.LOGDIR)
    for _ in range(3):
        jax.block_until_ready(f(scene, cam))
    jax.profiler.stop_trace()
    trace_probe.summarize()
    print("--- top individual ops ---")
    trace_probe.summarize_ops()


if __name__ == "__main__":
    main()
