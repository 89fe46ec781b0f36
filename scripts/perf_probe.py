"""TPU performance breakdown for the Cornell-box workload.

Times each layer of the stack separately so optimization effort goes where
the cycles are:
  * forward render, while_loop (early exit) vs scan (lockstep)
  * differentiable forward + backward
  * closest_hit alone, shading alone, RNG alone
Run on the TPU (default platform); prints a table.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import integrator, intersect, render as render_lib, shade
from another_raytracer_tpu.ops.vec3 import V3

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 4


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1000:9.2f} ms")
    return dt, out


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    print(f"workload: {W}x{H} spp={SPP} depth={DEPTH} spass={SPASS} "
          f"({W*H*SPP/1e6:.1f}M primary rays)")

    # full forward, while_loop early exit
    f_while = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
        max_depth=DEPTH, t_min=1e-3, differentiable=False))
    dt, (acc, segs) = timeit("forward (while_loop early-exit)", f_while, scene, cam)
    segs = int(segs)
    print(f"{'':40s} -> {segs/1e6:.2f}M segments, {segs/dt/1e6:8.2f} Mrays/s")

    # full forward, lockstep scan
    f_scan = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
        max_depth=DEPTH, t_min=1e-3, differentiable=True))
    dt, _ = timeit("forward (lockstep scan)", f_scan, scene, cam)
    print(f"{'':40s} -> honest {segs/dt/1e6:8.2f} Mrays/s "
          f"(lockstep {W*H*SPP*DEPTH/dt/1e6:.1f}M seg/s)")

    # fwd+bwd
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)
    g = jax.jit(lambda p, s, c, t: jax.value_and_grad(diff.render_loss)(
        p, s, c, t, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
        max_depth=DEPTH, t_min=1e-3))
    dt, _ = timeit("forward+backward (grad)", g, params, scene, cam, target)
    print(f"{'':40s} -> honest {segs/dt/1e6:8.2f} Mrays/s fwd+bwd")

    # single-bounce components at B = W*H*SPASS rays
    B = W * H * SPASS
    px = jnp.arange(B, dtype=jnp.uint32) % jnp.uint32(W * H)
    sm = jnp.zeros((B,), jnp.uint32)
    o, d, tm = camera_lib.generate_rays(cam, px, sm, W, H, seed)
    um = jnp.zeros((B, 0), jnp.float32)

    ch = jax.jit(lambda s, o, d, tm: intersect.closest_hit(s, o, d, tm, um, 1e-3))
    dt, (t, kind, idx) = timeit(f"closest_hit (B={B/1e6:.2f}M)", ch, scene, o, d, tm)
    print(f"{'':40s} -> {B/dt/1e6:8.1f} Mrays/s per bounce-equivalent")

    mk = jax.jit(lambda s, o, d, tm, t, k, i: intersect.make_hit_record(s, o, d, tm, t, k, i))
    dt, rec = timeit("make_hit_record", mk, scene, o, d, tm, t, kind, idx)

    sc = jax.jit(lambda s, rec, d: shade.scatter(s, rec, d, px, sm, 0, seed))
    dt, _ = timeit("scatter+texture", sc, scene, rec, d)

    em = jax.jit(lambda s, rec: shade.emitted(s, rec))
    dt, _ = timeit("emitted", em, scene, rec)

    cg = jax.jit(lambda: camera_lib.generate_rays(cam, px, sm, W, H, seed))
    dt, _ = timeit("generate_rays (RNG-heavy)", cg)

    from another_raytracer_tpu.ops import rng
    rr = jax.jit(lambda: rng.uniform2(0, px, sm, 1, 0))
    dt, _ = timeit("one uniform2 (threefry20)", rr)


if __name__ == "__main__":
    main()
