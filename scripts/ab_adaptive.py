"""In-process A/B of the adaptive-mode knobs on reference_default
(720x540 spp100 depth50 adaptive capsule mesh).

Arms:
  spass1        — dead-padded buckets, samples_per_pass pinned to 1
  auto          — dead-padded + auto spass widening (the new default)
  auto_nofold   — auto widening with the triangle record fold gated OFF
                  (fold engages at 131072-lane buckets; round 4 recorded a
                  fold regression on narrow-bucket adaptive runs)

Adaptive runs are host-driven loops (no jit cache to clear between arms
beyond render_lib's); each arm re-runs the full adaptive render twice and
keeps the best wall.

Usage: python scripts/ab_adaptive.py
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


def run(scene, cam, cfg):
    t0 = time.perf_counter()
    img, stats = render_lib.render(scene, cam, cfg)
    return img, stats, time.perf_counter() - t0


def main():
    builder, W, H, SPP, DEPTH, _ = bench_extra.CONFIGS["reference_default"]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    base = dict(width=W, height=H, samples_per_pixel=SPP, max_depth=DEPTH,
                mode=RenderMode.ADAPTIVE)

    arms = {
        "spass1": (RenderConfig(**base, adaptive_spass=1), None),
        "auto": (RenderConfig(**base), None),
        "auto_nofold": (RenderConfig(**base), 1 << 30),
    }
    imgs, walls = {}, {}
    for name, (cfg, min_b) in arms.items():
        old = intersect.FOLD_RECORD_MIN_B
        if min_b is not None:
            intersect.FOLD_RECORD_MIN_B = min_b
        render_lib.clear_trace_caches()
        try:
            img, stats, w0 = run(scene, cam, cfg)  # compile + first
            _, stats, w1 = run(scene, cam, cfg)
            _, stats, w2 = run(scene, cam, cfg)
        finally:
            intersect.FOLD_RECORD_MIN_B = old
        imgs[name] = img
        walls[name] = min(w1, w2)
        print(f"{name:12s} first {w0:6.2f} s  best {walls[name]:6.3f} s  "
              f"segments {stats['segments']/1e6:.1f}M "
              f"traced {stats['traced_pixels']}")

    a = imgs["spass1"].astype(np.int32)
    for name in ("auto", "auto_nofold"):
        b = imgs[name].astype(np.int32)
        close = (np.abs(a - b) <= 2).all(-1)
        print(f"VALIDATE {name}: {close.mean():.4%} pixels within 2/255")
    best = min(walls, key=walls.get)
    print(f"\nbest: {best} {walls[best]:.3f} s")


if __name__ == "__main__":
    main()
