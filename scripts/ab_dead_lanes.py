"""A/B (one process, interleaved — repo rule #9): zero dead-lane ray
directions before the winner search vs stale-ray lockstep, on the capsule
mesh render (packet-BVH traversal follows the union of a block's lanes, so
stale dead rays force full-tree walks) and on the Cornell fwd+bwd bench
config (sweeps do fixed [B,N] work, so little change expected there).

RESULT (v5e, 2026-08-21, AFTER the rule-11 trace-cache fix — the original
forward-path run was vacuous): mesh fwd 75.4 ms parked vs 78.0 stale
(parking wins where a packet BVH exists), but Cornell fwd+bwd 57.1 parked
vs 52.5 stale — the two selects per bounce are pure cost on sweep-only
scenes.  _park_dead is now gated on scene.has_accel (static).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import library, mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import integrator
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.ops import vec3
from another_raytracer_tpu.utils import assets


def mesh_scene():
    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=True)


def bench(tag, make_fn, reps=6):
    outs, fns = {}, {}
    for name, flag in (("stale", False), ("zeroed", True)):
        integrator.ZERO_DEAD_DIRS = flag
        render_lib.clear_trace_caches()  # trace-time flag (CLAUDE.md rule 11)
        f = make_fn(flag)
        t0 = time.perf_counter()
        outs[name] = jax.block_until_ready(f())
        print(f"{tag}/{name}: compile+run {time.perf_counter()-t0:.1f}s")
        fns[name] = f
    integrator.ZERO_DEAD_DIRS = True

    a = np.asarray(jax.tree.leaves(outs["stale"])[0])
    b = np.asarray(jax.tree.leaves(outs["zeroed"])[0])
    print(f"{tag}: outputs equal: {np.array_equal(a, b)} "
          f"max|diff| {np.abs(a.astype(np.float64)-b).max():.3e}")

    times = {n: [] for n in fns}
    for _ in range(reps):
        for n, f in fns.items():
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            times[n].append(time.perf_counter() - t0)
    for n in fns:
        ts = np.array(times[n][1:]) * 1000
        print(f"{tag}/{n:7s} {ts.mean():8.1f} ms (min {ts.min():.1f})")


def main():
    print("backend:", jax.default_backend())

    W, H, SPP, DEPTH = 240, 180, 8, 6
    scene = mesh_scene()
    cam = camera_lib.make_camera(
        aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)

    def mesh_fn(flag):
        f = jax.jit(lambda s, c, _f=flag: render_lib.render_radiance(
            s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
        return lambda: f(scene, cam)

    bench("mesh-fwd", mesh_fn)

    # Cornell fwd+bwd (the headline bench config)
    from another_raytracer_tpu.grad import diff

    w2, h2, spp2, d2 = 360, 270, 16, 8
    cscene, cparams = library.cornell_box()
    ccam = camera_lib.make_camera(aspect_ratio=w2 / h2, **cparams)
    params, _ = diff.split_params(cscene)
    target = jnp.zeros((w2 * h2, 3), jnp.float32)

    def cornell_fn(flag):
        f = jax.jit(lambda p, _f=flag: jax.value_and_grad(diff.render_loss)(
            p, cscene, ccam, target, jnp.uint32(0), width=w2, height=h2,
            spp=spp2, samples_per_pass=1, max_depth=d2, t_min=1e-3))
        return lambda: f(params)

    bench("cornell-fwd+bwd", cornell_fn)


if __name__ == "__main__":
    main()
