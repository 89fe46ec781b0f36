"""In-process A/B: FOLD_RECORD_MIN_B for the FULL winner-record fold on
the adaptive reference_default workload (buckets 16-65k lanes sit below
the 131072 gate tuned in round 4 for the PARTIAL fold — the full fold
saves ~2.5x more XLA-side work per lane, so the break-even width may be
much lower now).

Arms: gate 131072 (default: adaptive buckets never fold), 32768, 8192.

Usage: python scripts/ab_fold_minb.py
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
from another_raytracer_tpu.ops import camera as camera_lib, intersect
from another_raytracer_tpu.ops import render as render_lib


def main():
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["reference_default"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    cfg = RenderConfig(width=W, height=H, samples_per_pixel=SPP,
                       max_depth=DEPTH, mode=RenderMode.ADAPTIVE)

    imgs, walls = {}, {}
    old = intersect.FOLD_RECORD_MIN_B
    try:
        for min_b in (131072, 32768, 8192):
            intersect.FOLD_RECORD_MIN_B = min_b
            render_lib.clear_trace_caches()
            t0 = time.perf_counter()
            img, stats = render_lib.render(scene, cam, cfg)  # compile+first
            first = time.perf_counter() - t0
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                img, stats = render_lib.render(scene, cam, cfg)
                best = min(best, time.perf_counter() - t0)
            imgs[min_b] = img
            walls[min_b] = best
            print(f"min_b {min_b:6d}: first {first:6.1f} s  best {best:6.3f} s"
                  f"  segments {stats['segments']/1e6:.1f}M")
    finally:
        intersect.FOLD_RECORD_MIN_B = old
        render_lib.clear_trace_caches()

    a = imgs[131072].astype(np.int32)
    for min_b in (32768, 8192):
        close = (np.abs(a - imgs[min_b].astype(np.int32)) <= 2).all(-1)
        print(f"VALIDATE {min_b}: {close.mean():.4%} pixels within 2/255")
    best = min(walls, key=walls.get)
    print(f"\nbest: min_b {best} at {walls[best]:.3f} s")


if __name__ == "__main__":
    main()
