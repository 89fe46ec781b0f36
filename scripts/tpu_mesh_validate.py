"""On-hardware validation of the Pallas packet-BVH kernel (round-1 VERDICT #1).

The kernel (ops/pallas/bvh_kernel.py) is the traversal used for every TPU
mesh render (models/scene.py pallas_bvh='auto'), but round 1 only exercised
it in interpret mode.  This script proves it on the real chip:

  phase "tpu" (run on the TPU):
    * build the capsule mesh scene, fire one deterministic primary-ray batch,
      run ``bvh_closest_hit`` on hardware, dump (o, d, t, idx, hit) to .npy;
    * render the full mesh scene tiny-res through the Pallas path, dump the
      radiance sums.
  phase "cpu" (run on CPU; tests/conftest-style platform override):
    * brute-force all 10,200 triangles per ray in f32 NumPy; compare winners;
    * re-render the same scene through the XLA lockstep traversal
      (pallas_bvh=False) and compare images.

Usage: python scripts/tpu_mesh_validate.py {tpu|cpu}
Artifacts in scripts/out/ (gitignored).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent / "out"
OUT.mkdir(exist_ok=True)

W, H = 192, 144  # primary-ray batch for winner validation
RW, RH, SPP, DEPTH = 160, 120, 4, 4  # tiny full render

import numpy as np


def build_scene(pallas):
    from another_raytracer_tpu.models import mesh as mesh_lib
    from another_raytracer_tpu.models.scene import SceneBuilder
    from another_raytracer_tpu.utils import assets

    b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
    mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    return b.build(bvh=True, pallas_bvh=pallas)


def primary_rays(cam):
    import jax.numpy as jnp

    from another_raytracer_tpu.ops import camera as camera_lib

    pix = jnp.arange(W * H, dtype=jnp.uint32)
    samp = jnp.zeros((W * H,), jnp.uint32)
    o, d, _ = camera_lib.generate_rays(cam, pix, samp, W, H, jnp.uint32(0),
                                       needs_time=False)
    return o, d


def make_cam(w, h):
    from another_raytracer_tpu.ops import camera as camera_lib

    return camera_lib.make_camera(
        aspect_ratio=w / h, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
        vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
        time0=0.0, time1=1.0)


def phase_tpu():
    import jax
    import jax.numpy as jnp

    from another_raytracer_tpu.ops import render as render_lib
    from another_raytracer_tpu.ops import vec3
    from another_raytracer_tpu.ops.pallas import bvh_kernel

    print("backend:", jax.default_backend(), jax.devices())
    scene = build_scene(pallas=True)
    assert scene.use_pallas_bvh, "expected the Pallas path on this backend"
    print(f"triangles={scene.n_triangles} bvh_nodes={scene.n_bvh_nodes}")

    o, d = primary_rays(make_cam(W, H))
    B = W * H
    init_t = jnp.full((B,), bvh_kernel.BIG, jnp.float32)
    init_i = jnp.zeros((B,), jnp.int32)
    # leaf_size/block MUST come from the scene: the kernel's unrolled leaf
    # loop tests exactly leaf_size triangles, and the tree was packed with
    # scene.bvh_leaf_size-wide leaves (a smaller kernel leaf_size silently
    # skips the tail of every leaf — measured as 26% missing hits when this
    # script passed the stale default 8 against a leaf-16 tree).
    t, code, hit = bvh_kernel.bvh_closest_hit(
        scene.bvh_packed_nodes, scene.bvh_packed_tris, o, d, init_t, init_i,
        t_min=1e-3, leaf_size=scene.bvh_leaf_size, block=scene.bvh_block)
    idx = code >> 2  # rows carry id*4 + kind codes
    jax.block_until_ready(t)
    np.save(OUT / "rays_o.npy", vec3.to_numpy(o))
    np.save(OUT / "rays_d.npy", vec3.to_numpy(d))
    np.save(OUT / "pal_t.npy", np.asarray(t))
    np.save(OUT / "pal_idx.npy", np.asarray(idx))
    np.save(OUT / "pal_hit.npy", np.asarray(hit))
    print(f"winner batch done: {int(np.asarray(hit).sum())}/{B} rays hit the mesh")

    acc, segs = render_lib.render_radiance(
        scene, make_cam(RW, RH), jnp.uint32(0), width=RW, height=RH, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)
    np.save(OUT / "pal_img.npy", vec3.to_numpy(acc))
    print(f"tiny render done: segments={int(segs)}")
    print("TPU phase OK")


def brute_force_np(scene, o, d, t_min=1e-3):
    """f32 NumPy linear sweep over all triangles; mirrors _kernel.tri_test."""
    v0 = np.asarray(scene.tri_v0, np.float32)
    v1 = np.asarray(scene.tri_v1, np.float32)
    v2 = np.asarray(scene.tri_v2, np.float32)
    B = o.shape[0]
    best_t = np.full((B,), 3e37, np.float32)
    best_i = np.full((B,), -1, np.int32)
    for s in range(0, v0.shape[0], 1024):
        a0, a1, a2 = v0[s:s + 1024], v1[s:s + 1024], v2[s:s + 1024]
        n = np.cross(a1 - a0, a2 - a0).astype(np.float32)  # [n,3]
        ndotd = d @ n.T  # [B,n]
        ndoto = o @ n.T
        nv0 = np.einsum("nc,nc->n", n, a0).astype(np.float32)
        ok = ndotd != 0.0
        t = np.where(ok, (nv0[None] - ndoto) / np.where(ok, ndotd, 1.0), 3e37)
        t = t.astype(np.float32)
        p = o[:, None, :] + t[..., None] * d[:, None, :]  # [B,n,3]

        def edge(a, b):
            e = (b - a).astype(np.float32)
            c = np.cross(np.broadcast_to(e, p.shape), p - a).astype(np.float32)
            return np.einsum("bnc,nc->bn", c, n)

        valid = (ok & (edge(a0, a1) >= 0) & (edge(a1, a2) >= 0)
                 & (edge(a2, a0) >= 0) & (t > t_min) & (t < best_t[:, None]))
        t = np.where(valid, t, 3e37).astype(np.float32)
        j = t.argmin(axis=1)
        tm = t[np.arange(B), j]
        better = tm < best_t
        best_t = np.where(better, tm, best_t)
        best_i = np.where(better, (j + s).astype(np.int32), best_i)
    return best_t, best_i, best_i >= 0


def phase_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from another_raytracer_tpu.ops import render as render_lib
    from another_raytracer_tpu.ops import vec3

    scene = build_scene(pallas=False)
    o = np.load(OUT / "rays_o.npy").astype(np.float32)
    d = np.load(OUT / "rays_d.npy").astype(np.float32)
    pal_t = np.load(OUT / "pal_t.npy")
    pal_i = np.load(OUT / "pal_idx.npy")
    pal_h = np.load(OUT / "pal_hit.npy").astype(bool)

    bt, bi, bh = brute_force_np(scene, o, d)
    hit_agree = (pal_h == bh).mean()
    both = pal_h & bh
    t_err = np.abs(pal_t[both] - bt[both]) / np.maximum(1.0, np.abs(bt[both]))
    idx_agree = (pal_i[both] == bi[both]).mean()
    # Index mismatches are legitimate only when two triangles tie on t.
    mism = both & (pal_i != bi)
    print(f"hit-flag agreement : {hit_agree:.6f}  ({int(pal_h.sum())} vs {int(bh.sum())} hits)")
    print(f"t rel err (both-hit): max {t_err.max():.3e}  mean {t_err.mean():.3e}")
    print(f"winner idx agreement: {idx_agree:.6f}  ({int(mism.sum())} mismatches)")
    if mism.any():
        print(f"  mismatch t rel err max: "
              f"{(np.abs(pal_t[mism] - bt[mism]) / np.maximum(1, np.abs(bt[mism]))).max():.3e}")

    ok_winners = hit_agree == 1.0 and t_err.max() < 1e-4 and (
        idx_agree == 1.0
        or np.allclose(pal_t[mism], bt[mism], rtol=1e-4, atol=1e-4))

    acc, _ = render_lib.render_radiance(
        scene, make_cam(RW, RH), jnp.uint32(0), width=RW, height=RH, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)
    cpu_img = vec3.to_numpy(acc)
    pal_img = np.load(OUT / "pal_img.npy")
    diff = np.abs(cpu_img - pal_img)
    frac_close = (diff.max(axis=-1) < 1e-2).mean()
    print(f"image: mean|diff| {diff.mean():.3e}  max {diff.max():.3e}  "
          f"pixels within 1e-2: {frac_close:.4f}")
    # f32 lane-order differences accumulate over 4 bounces; demand near-total
    # pixel agreement rather than bitwise equality.
    ok_img = diff.mean() < 1e-3 and frac_close > 0.995
    print("VALIDATION", "PASS" if (ok_winners and ok_img) else "FAIL")
    return 0 if (ok_winners and ok_img) else 1


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    if phase == "tpu":
        phase_tpu()
    else:
        sys.exit(phase_cpu())
