"""In-process A/B: staged-compaction parameters for the depth-50 adaptive
regime.  At reference_default's 16-65k bucket widths the defaults
(MIN_B=8192, SHRINK=8) produce zero or one tail stage, so the long
depth-50 occupancy decay runs at full width.  Arms vary (MIN_B, SHRINK).

Usage: python scripts/ab_regen_stages.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from another_raytracer_tpu.utils import compcache

compcache.enable()

import numpy as np

import bench_extra
from another_raytracer_tpu.config import RenderConfig, RenderMode
from another_raytracer_tpu.ops import camera as camera_lib, integrator
from another_raytracer_tpu.ops import render as render_lib

ARMS = {
    "default_8192_8": (8192, 8),
    "min2048_s8": (2048, 8),
    "min2048_s4": (2048, 4),
    "min4096_s4": (4096, 4),
}


def main():
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["reference_default"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       max_depth=DEPTH, mode=RenderMode.ADAPTIVE)

    imgs, walls = {}, {}
    old = (integrator.REGEN_COMPACT_MIN_B, integrator.REGEN_COMPACT_SHRINK)
    try:
        for name, (min_b, shrink) in ARMS.items():
            integrator.REGEN_COMPACT_MIN_B = min_b
            integrator.REGEN_COMPACT_SHRINK = shrink
            render_lib.clear_trace_caches()
            t0 = time.perf_counter()
            img, stats = render_lib.render(scene, cam, cfg)
            first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                img, stats = render_lib.render(scene, cam, cfg)
                best = min(best, time.perf_counter() - t0)
            imgs[name] = img
            walls[name] = best
            print(f"{name:15s}: first {first:6.1f} s  best {best:6.3f} s")
    finally:
        (integrator.REGEN_COMPACT_MIN_B,
         integrator.REGEN_COMPACT_SHRINK) = old
        render_lib.clear_trace_caches()

    a = imgs["default_8192_8"].astype(np.int32)
    for name in ARMS:
        if name == "default_8192_8":
            continue
        close = (np.abs(a - imgs[name].astype(np.int32)) <= 2).all(-1)
        print(f"VALIDATE {name}: {close.mean():.4%} pixels within 2/255")
    best = min(walls, key=walls.get)
    print(f"\nbest: {best} at {walls[best]:.3f} s")


if __name__ == "__main__":
    main()
