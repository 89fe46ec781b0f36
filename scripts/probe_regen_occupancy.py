"""Measure the regenerating wavefront's alive-count trajectory for a bench
scene: python scripts/probe_regen_occupancy.py <name> [max_iters].

Drives integrator._regen_loop_parts (the EXACT production body) under a
fixed-length lax.scan that records jnp.sum(alive) each iteration — the
ground truth for sizing the staged-compaction thresholds instead of
guessing the occupancy curve's shape.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

import bench_extra
from another_raytracer_tpu.ops import camera as camera_lib, integrator


def main():
    name = sys.argv[1]
    max_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    builder, W, H, SPP, DEPTH, _mode = bench_extra.CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cp)
    B = W * H

    def run(scene, cam):
        pixel_ids = jnp.arange(B, dtype=jnp.uint32)
        limit = jnp.uint32(SPP)
        cam_rays, body = integrator._regen_loop_parts(
            scene, cam, pixel_ids, jnp.uint32(0), W, H, 1, limit, DEPTH, 1e-3)
        sample0 = jnp.zeros((B,), jnp.uint32)
        state = integrator._regen_initial_state(cam_rays, pixel_ids, sample0,
                                                limit)

        def step(state, _):
            counts = jnp.sum(state[6].astype(jnp.int32))
            state = jax.lax.cond(counts > 0, body, lambda s: s, state)
            return state, counts

        _, counts = jax.lax.scan(step, state, None, length=max_iters)
        return counts

    counts = jax.jit(run)(scene, cam)
    counts = jax.device_get(counts)
    print(f"{name}: B={B} spp={SPP} depth={DEPTH}")
    occupancy = counts.sum() / (max(1, (counts > 0).sum()) * B)
    iters = int((counts > 0).sum())
    print(f"iterations={iters}  mean occupancy={occupancy:.1%}")
    for frac in (0.5, 0.25, 0.125, 1 / 16, 1 / 32, 1 / 64, 1 / 128):
        k = (counts > B * frac).sum()
        print(f"  alive > B/{int(1/frac):3d} for {int(k):4d} iters")


if __name__ == "__main__":
    main()
