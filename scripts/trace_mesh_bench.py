"""Profiler trace of the capsule-mesh forward render at the BENCH size
(720x540 spp16 depth8, library.mesh_scene defaults) — ground truth for the
round-5 winner-record work.  Run on the chip; prints the per-op summary
(trace_probe.summarize_ops)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

import trace_probe
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

W, H, SPP, DEPTH = 720, 540, 16, 8
trace_probe.LOGDIR = "/tmp/artpu_trace_mesh_bench"


def main():
    scene, cam_params = library.mesh_scene()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)

    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
    import time
    t0 = time.perf_counter()
    out = f(scene, cam)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter()-t0:.1f} s")
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    segs = int(out[1])
    print(f"wall {dt*1000:.1f} ms  {segs/dt/1e6:.2f} Mrays/s ({segs/1e6:.1f}M segs)")

    jax.profiler.start_trace(trace_probe.LOGDIR)
    for _ in range(2):
        jax.block_until_ready(f(scene, cam))
    jax.profiler.stop_trace()
    print("trace captured")
    trace_probe.summarize()
    print('--- top individual ops ---')
    trace_probe.summarize_ops()


if __name__ == "__main__":
    main()
