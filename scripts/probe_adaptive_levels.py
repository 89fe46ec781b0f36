"""Per-level wall breakdown of the reference_default adaptive render:
times every eval_pixels launch (compile excluded via a warm first run) and
the host heuristic/interpolate work between them.  Ground truth for the
device-side-level-loop decision (VERDICT r4 item 2).

Usage: python scripts/probe_adaptive_levels.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from another_raytracer_tpu.utils import compcache

compcache.enable()

import jax

import bench_extra
from another_raytracer_tpu.config import RenderConfig, RenderMode
from another_raytracer_tpu.ops import adaptive
from another_raytracer_tpu.ops import camera as camera_lib, render as render_lib


def main():
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["reference_default"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       max_depth=DEPTH, mode=RenderMode.ADAPTIVE)

    events = []
    orig_tp = adaptive._trace_pixels

    def timed_tp(scene, cam, pixel_ids, lane_mask, seed, **kw):
        t0 = time.perf_counter()
        out = orig_tp(scene, cam, pixel_ids, lane_mask, seed, **kw)
        jax.block_until_ready(out)
        events.append(("trace", pixel_ids.shape[0],
                       int(lane_mask.sum()), time.perf_counter() - t0))
        return out

    adaptive._trace_pixels = timed_tp
    try:
        t0 = time.perf_counter()
        img, stats = render_lib.render(scene, cam, cfg)  # warm (compiles)
        warm = time.perf_counter() - t0
        events.clear()
        t0 = time.perf_counter()
        img, stats = render_lib.render(scene, cam, cfg)
        total = time.perf_counter() - t0
    finally:
        adaptive._trace_pixels = orig_tp

    print(f"warm-run total {warm:.2f} s; measured total {total:.3f} s, "
          f"segments {stats['segments']/1e6:.1f}M")
    tsum = 0.0
    for i, (kind, bucket, valid, dt) in enumerate(events):
        tsum += dt
        print(f"level {i}: bucket {bucket:6d} valid {valid:6d} "
              f"({valid/bucket:5.1%})  {dt*1000:8.1f} ms")
    print(f"device launches {tsum:.3f} s; host (heuristic+interp+glue) "
          f"{total - tsum:.3f} s")


if __name__ == "__main__":
    main()
