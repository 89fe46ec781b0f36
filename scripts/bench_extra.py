"""Recorded benchmarks for ALL five BASELINE.md configs (+ the capsule mesh).

bench.py's headline metric is the Cornell fwd+bwd step (one JSON line for
the driver).  This script measures every BASELINE.md benchmark config on the
current backend and writes BENCH_EXTRA.json at the repo root so the numbers
are recorded, not folklore:

  1. sphere_ground — single lambertian sphere + ground (BASELINE config 1)
  2. random       — *In One Weekend* final scene (config 2)
  3. textures     — *The Next Week* texture set: checker ground, Perlin
                    sphere, earthmap sphere, motion-blurred sphere (config 3)
  4. cornell      — Cornell box, forward (config 4's scene; the fwd+bwd
                    headline lives in bench.py / BENCH_r*.json)
  5. mesh_hd      — cow.obj at 1920x1080 ADAPTIVE (config 5; triangle BVH +
                    adaptive subsampling, the reference's default mode)
  +  mesh         — capsule at 720x540 forward (the reference's default
                    scene, main.cpp:20, at its 4:3 aspect)
  +  final        — The Next Week final scene (the reference's heaviest)

Usage: python scripts/bench_extra.py [name ...]   (default: all)
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from another_raytracer_tpu.utils import compcache

compcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from another_raytracer_tpu.models import library
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.utils import assets, imageio


def metal_diel_scene():
    """Four-sphere metal/dielectric/lambertian sweep scene — the fused
    differentiable path's round-5 widened class (material.h:45-99
    parameters; tests/test_mega_diff.py verifies grads vs autodiff)."""
    from another_raytracer_tpu.models.scene import SceneBuilder

    b = SceneBuilder(background=(0.70, 0.80, 1.00), seed=2)
    b.sphere((0, -100.5, -1), 100, b.lambertian(color=(0.8, 0.8, 0.0)))
    b.sphere((0, 0, -1), 0.5, b.lambertian(color=(0.1, 0.2, 0.5)))
    b.sphere((-1, 0, -1), 0.5, b.dielectric(1.5))
    b.sphere((1, 0, -1), 0.5, b.metal(color=(0.8, 0.6, 0.2), fuzz=0.4))
    return b.build(), dict(lookfrom=(0, 0, 0), lookat=(0, 0, -1), vfov=90)


def sphere_ground_scene():
    """BASELINE config 1: one lambertian sphere + ground plane sphere."""
    b = SceneBuilder(background=library.SKY)
    b.sphere((0, 0, -1), 0.5, b.lambertian(color=(0.5, 0.5, 0.5)))
    b.sphere((0, -100.5, -1), 100, b.lambertian(color=(0.5, 0.5, 0.5)))
    return b.build(), library._cam((0, 0, 0), (0, 0, -1), 90.0, aperture=0.0)


def textures_scene():
    """BASELINE config 3: checker + Perlin + earthmap image + motion blur."""
    b = SceneBuilder(background=library.SKY)
    checker = b.checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    b.sphere((0, -1000, 0), 1000, b.lambertian(texture=checker))
    b.sphere((-4, 1, 0), 1.0, b.lambertian(texture=b.noise_texture(4.0)))
    path = assets.earthmap_path()
    img = imageio.load_image(path) if path else None
    b.sphere((0, 1, 0), 1.0, b.lambertian(texture=b.image_texture(img)))
    b.moving_sphere((4, 1, 0), (4, 1.3, 0), 0, 1, 1.0,
                    b.lambertian(color=(0.7, 0.3, 0.1)))
    return b.build(), library._cam((13, 2, 3), (0, 0, 0), 20.0, aperture=0.0)


def _cow_scene():
    path = assets.cow_obj_path()
    if path is None:
        raise FileNotFoundError("cow.obj not available")
    return library.mesh_scene(obj_path=path)


# name -> (scene factory, W, H, spp, depth, mode)
CONFIGS = {
    "sphere_ground": (sphere_ground_scene, 400, 225, 64, 8, "single"),
    "random": (library.random_scene, 400, 225, 8, 8, "single"),
    "textures": (textures_scene, 400, 225, 16, 8, "single"),
    "cornell": (library.cornell_box, 360, 270, 16, 8, "single"),
    "mesh": (library.mesh_scene, 720, 540, 16, 8, "single"),
    "final": (library.final_scene, 240, 180, 8, 8, "single"),
    "mesh_hd": (_cow_scene, 1920, 1080, 16, 8, "adaptive"),
    # Forward+backward on a BVH'd scene: proves the differentiable path
    # (unrolled lockstep scan + winner recompute) composes with the Pallas
    # packet kernels beyond Cornell.  Gradients w.r.t. textures/materials
    # AND the 10,200 triangle vertices (BASELINE.json north star:
    # "geometry gradients ... backward wavefront").
    "mesh_grad": (library.mesh_scene, 240, 180, 4, 6, "grad"),
    # Second fused-diff-path config (sweep scene, custom-VJP megakernel
    # primal + replay backward) beyond the Cornell headline.
    "sphere_ground_grad": (sphere_ground_scene, 400, 225, 16, 8, "grad"),
    # Round-5 widened fused-diff class: metal + dielectric through the
    # custom-VJP megakernel (albedo routing + unit-attenuation sentinel +
    # absorption chain-kill).
    "metal_diel_grad": (metal_diel_scene, 400, 225, 16, 8, "grad"),
    # fwd+bwd AT THE FORWARD BENCH CONFIGS (VERDICT r4 item 8): any
    # residual blow-up on 10,200 tris at 389k rays becomes visible here.
    "mesh_grad_bench": (library.mesh_scene, 720, 540, 16, 8, "grad"),
    "random_grad": (library.random_scene, 400, 225, 8, 8, "grad"),
    "final_grad_bench": (library.final_scene, 240, 180, 8, 8, "grad"),
    "textures_grad": (textures_scene, 400, 225, 16, 8, "grad"),
    # The reference's own default workload: 720x540, 100 spp, max_depth 50,
    # adaptive mode, capsule mesh (tracer_constants.h:6-13, main.cpp:20,44).
    "reference_default": (library.mesh_scene, 720, 540, 100, 50, "adaptive"),
}


def run_forward(scene, cam, w, h, spp, depth):
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
    return dt, segs, compile_s, {}


def run_adaptive(scene, cam, w, h, spp, depth):
    from another_raytracer_tpu.config import RenderConfig, RenderMode

    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp,
                       max_depth=depth, mode=RenderMode.ADAPTIVE)
    t0 = time.perf_counter()
    _, stats = render_lib.render(scene, cam, cfg)  # compile + first run
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, stats = render_lib.render(scene, cam, cfg)
    dt = time.perf_counter() - t0
    extra = {"traced_pixels": stats["traced_pixels"],
             "total_pixels": stats["total_pixels"]}
    return dt, stats["segments"], compile_s, extra


def run_grad(scene, cam, w, h, spp, depth):
    import jax as _jax

    from another_raytracer_tpu.grad import diff

    trainable = diff.DEFAULT_TRAINABLE + ("tri_v0", "tri_v1", "tri_v2")
    params, _ = diff.split_params(scene, trainable)
    target = jnp.zeros((w * h, 3), jnp.float32)
    step = _jax.jit(lambda p, s, c, t: _jax.value_and_grad(diff.render_loss)(
        p, s, c, t, jnp.uint32(0), width=w, height=h, spp=spp,
        samples_per_pass=1, max_depth=depth, t_min=1e-3))
    # Honest segment count from an (untimed) forward render.
    _, segs = _jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(0), width=w, height=h, spp=spp, samples_per_pass=1,
        max_depth=depth, t_min=1e-3, differentiable=True))(scene, cam)
    segs = int(segs)
    t0 = time.perf_counter()
    loss, grads = step(params, scene, cam, target)
    jax.block_until_ready(grads)
    compile_s = time.perf_counter() - t0
    gnorm = float(sum(jnp.sum(g * g) for g in jax.tree.leaves(grads)) ** 0.5)
    assert np.isfinite(gnorm) and gnorm > 0.0, gnorm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(params, scene, cam, target)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    extra = {"fwd_bwd": True, "grad_leaves": len(jax.tree.leaves(grads)),
             "grad_norm": round(gnorm, 5)}
    # Device-span timing (CLAUDE.md rule 13: block_until_ready on
    # grad-sized outputs can return before device work completes; the
    # XLA-module span is the honest substrate for grad steps).
    try:
        import tempfile

        from another_raytracer_tpu.utils import profiling

        with tempfile.TemporaryDirectory() as logdir:
            jax.profiler.start_trace(logdir)
            for _ in range(reps):
                out = step(params, scene, cam, target)
            jax.block_until_ready(out)
            time.sleep(1.0)
            jax.profiler.stop_trace()
            dev_ms = profiling.module_device_seconds(logdir) / reps * 1e3
        extra["device_ms"] = round(dev_ms, 2)
        extra["device_mrays_per_s"] = round(segs / dev_ms / 1e3, 2)
    except Exception:
        pass
    return dt, segs, compile_s, extra


# Cross-process wall variance on this tunnel is large (CLAUDE.md rules
# 10/12; congested windows read 2-6x high — inflated compile_s is the
# tell).  Rows listed here carry the warning explicitly so a future
# round doesn't "regress" them by re-rolling the dice.
VARIANCE_NOTES = {
    "mesh_hd": "walls swing 2.9-14 s across identical-code processes; "
               "compare in-process A/Bs only",
    "reference_default": "calm-window walls 2.2-2.9 s; congested windows "
                         "read 5-7 s",
}


def run_one(name):
    builder, w, h, spp, depth, mode = CONFIGS[name]
    scene, cp = builder()
    cam = camera_lib.make_camera(aspect_ratio=w / h, **cp)
    runner = {"adaptive": run_adaptive, "grad": run_grad}.get(mode, run_forward)
    dt, segs, compile_s, extra = runner(scene, cam, w, h, spp, depth)
    rec = {
        "scene": name, "config": f"{w}x{h} spp{spp} depth{depth} {mode}",
        "ms": round(dt * 1000, 1), "mrays_per_s": round(segs / dt / 1e6, 2),
        "segments": segs, "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(), **extra,
    }
    if name in VARIANCE_NOTES:
        rec["variance_note"] = VARIANCE_NOTES[name]
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
        try:
            prev[n] = run_one(n)
        except FileNotFoundError as e:
            print(f"skip {n}: {e}")
    out_path.write_text(json.dumps(list(prev.values()), indent=1) + "\n")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
