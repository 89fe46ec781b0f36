"""In-process A/B: argmin-based vs two-plain-reduce _fold_kind.

Remote-tunnel dispatch variance is ~±15% across processes, so layout/op
experiments are only meaningful interleaved in one process.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib, intersect, render as render_lib
from another_raytracer_tpu.grad import diff

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 4


def fold_argmin(best, t, valid, kind, base_idx):
    bt, bk, bi = best
    t = jnp.where(valid, t, intersect.BIG)
    i = jnp.argmin(t, axis=-1)
    tm = jnp.min(t, axis=-1)
    better = tm < bt
    return (
        jnp.where(better, tm, bt),
        jnp.where(better, kind, bk),
        jnp.where(better, i.astype(jnp.int32) + base_idx, bi),
    )


fold_two_reduce = intersect._fold_kind


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)

    fns = {}
    for name, fold in (("argmin", fold_argmin), ("two_reduce", fold_two_reduce)):
        intersect._fold_kind = fold
        fns[name] = (
            jax.jit(lambda s, c, _k=name: render_lib.render_radiance(
                s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
                max_depth=DEPTH, t_min=1e-3, differentiable=False)),
            jax.jit(lambda p, s, c, t, _k=name: jax.value_and_grad(diff.render_loss)(
                p, s, c, t, seed, width=W, height=H, spp=SPP,
                samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3)),
        )
        # compile both now (the _k capture makes the jit caches distinct)
        jax.block_until_ready(fns[name][0](scene, cam))
        jax.block_until_ready(fns[name][1](params, scene, cam, target))
    intersect._fold_kind = fold_two_reduce

    for rnd in range(3):
        for name, (fwd, g) in fns.items():
            tf = timeit(fwd, scene, cam)
            tg = timeit(g, params, scene, cam, target)
            print(f"round {rnd} {name:11s} fwd {tf*1000:7.2f} ms   fwd+bwd {tg*1000:7.2f} ms")


if __name__ == "__main__":
    main()
