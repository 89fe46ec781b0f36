"""Secondary recorded benchmarks: mesh, final, and random scenes (forward).

bench.py's headline metric is the Cornell fwd+bwd step; the reference's
default workload is the capsule mesh (main.cpp:20,44) and its heaviest
scenes are `final` and `random` (BVH'd in the reference,
scene_manager.cpp:61,176,231).  This script measures all three on the
current backend and writes BENCH_EXTRA.json at the repo root so the numbers
are recorded, not folklore.

Usage: python scripts/bench_extra.py [mesh|final|random ...]
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

# (scene builder, camera aspect source, W, H, spp, depth)
CONFIGS = {
    "mesh": (library.mesh_scene, 720, 540, 16, 8),
    "final": (library.final_scene, 240, 240, 8, 8),
    "random": (library.random_scene, 400, 225, 8, 8),
}


def run_one(name):
    builder, w, h, spp, depth = CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=w / h, **cp)
    f = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=w, height=h, spp=spp,
        samples_per_pass=1, max_depth=depth, t_min=1e-3))
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(scene, cam))
    compile_s = time.perf_counter() - t0
    segs = int(out[1])
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(scene, cam)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    rec = {
        "scene": name, "config": f"{w}x{h} spp{spp} depth{depth}",
        "ms": round(dt * 1000, 1), "mrays_per_s": round(segs / dt / 1e6, 2),
        "segments": segs, "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(rec))
    return rec


def main():
    names = sys.argv[1:] or list(CONFIGS)
    out_path = ROOT / "BENCH_EXTRA.json"
    prev = {}
    if out_path.exists():
        try:
            prev = {r["scene"]: r for r in json.loads(out_path.read_text())}
        except Exception:
            pass
    for n in names:
        prev[n] = run_one(n)
    out_path.write_text(json.dumps(list(prev.values()), indent=1) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
