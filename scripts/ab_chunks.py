"""In-process A/B: ray-batch size via pixel chunking (spass fixed at 1).

spass=1 already won 1.6x over spass=4 for fwd+bwd (smaller live set).  This
probes whether splitting the pixel axis into scan chunks (even smaller
batches) keeps winning or hits per-kernel overhead.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib, render as render_lib

W, H, SPP, DEPTH = 360, 270, 16, 8
NPIX = W * H


def loss_chunked(params, scene, cam, target, seed, n_chunks):
    s = diff.merge_params(scene, params)
    per = NPIX // n_chunks
    px_all = jnp.arange(NPIX, dtype=jnp.uint32)

    def one(acc, ci):
        px = jax.lax.dynamic_slice(px_all, (ci * per,), (per,))
        tgt = jax.lax.dynamic_slice(target, (ci * per, 0), (per, 3))
        a, _ = render_lib.radiance_batch(
            s, cam, px, seed, width=W, height=H, sample_start=0,
            n_samples=SPP, spp_cap=SPP, samples_per_pass=1,
            max_depth=DEPTH, t_min=1e-3, differentiable=True,
        )
        inv = 1.0 / SPP
        sq = ((a.x * inv - tgt[:, 0]) ** 2 + (a.y * inv - tgt[:, 1]) ** 2
              + (a.z * inv - tgt[:, 2]) ** 2)
        return acc + jnp.sum(sq), None

    tot, _ = jax.lax.scan(one, jnp.float32(0.0), jnp.arange(n_chunks))
    return tot / (3.0 * NPIX)


def timeit(fn, *args, iters=6):
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
    target = jnp.zeros((NPIX, 3), jnp.float32)

    fns = {}
    for nc in (1, 2, 4, 8):
        fns[nc] = jax.jit(lambda p, s, c, t, _nc=nc: jax.value_and_grad(
            loss_chunked)(p, s, c, t, seed, _nc))
        jax.block_until_ready(fns[nc](params, scene, cam, target))

    for rnd in range(2):
        for nc, g in fns.items():
            tg = timeit(g, params, scene, cam, target)
            print(f"round {rnd} chunks={nc}  rays/batch={NPIX//nc:7d}  "
                  f"fwd+bwd {tg*1000:7.2f} ms")


if __name__ == "__main__":
    main()
