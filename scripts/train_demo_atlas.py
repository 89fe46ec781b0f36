"""Inverse rendering of an IMAGE TEXTURE: recover perturbed earth-texture
texels by gradient descent on a rendered target (VERDICT r4 item 10 —
`atlas` sits in DEFAULT_TRAINABLE but no artifact showed texel gradients
recovering an image; reference semantics: texture.h:67-118).

Protocol:
  1. build an earth-textured sphere (downsampled earthmap so each texel
     receives enough path samples for stable gradients);
  2. render at the TRUE atlas -> target radiance;
  3. perturb every texel multiplicatively, clamp to [0, 1];
  4. adam over trainable=("atlas",) through the XLA diff path (the image
     fetch is a nearest-texel gather — its backward is a scatter-add onto
     the texel table);
  5. record loss curve + texel recovery error over WELL-OBSERVED texels
     (gradient weight >= 10% of max; the rest are touched only by rare
     secondary bounces — MC-noise gradients no optimizer can use from
     this viewpoint — and reported separately, not hidden).

Writes TRAIN_DEMO_ATLAS.json at the repo root on TPU runs.

Usage: python scripts/train_demo_atlas.py [--steps N] [--cpu]
"""

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def box_down(img, fy, fx):
    h, w = img.shape[:2]
    h2, w2 = h // fy * fy, w // fx * fx
    return img[:h2, :w2].reshape(h2 // fy, fy, w2 // fx, fx, 3).mean((1, 3))


def main():
    cpu = "--cpu" in sys.argv
    steps = 400
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])

    if cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from another_raytracer_tpu.utils import compcache

    compcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from another_raytracer_tpu.grad import diff
    from another_raytracer_tpu.models.scene import SceneBuilder
    from another_raytracer_tpu.ops import camera as camera_lib
    from another_raytracer_tpu.ops import render as render_lib, vec3
    from another_raytracer_tpu.utils import assets, imageio

    # Per-texel gradient signal scales with (pixels*spp)/texels; keep
    # >= ~1k samples per observed texel or adam random-walks in MC noise.
    if cpu:
        W, H, SPP, DEPTH, TEX = 48, 36, 16, 3, (8, 4)
    else:
        W, H, SPP, DEPTH, TEX = 180, 135, 32, 4, (32, 16)

    earth_path = assets.earthmap_path()
    if earth_path is None:
        print("skip: earthmap asset not found")
        return
    earth = np.asarray(imageio.load_image(earth_path), np.float64)
    if earth.max() > 1.5:  # uint8-range decode
        earth = earth / 255.0
    small = box_down(earth, earth.shape[0] // TEX[1], earth.shape[1] // TEX[0])
    print(f"texture {small.shape[1]}x{small.shape[0]} "
          f"({small.shape[0]*small.shape[1]} texels)")

    # Earth sphere over a gray ground, sky background (texture.h:67-118
    # earth-scene semantics: image-mapped lambertian sphere).
    b = SceneBuilder(background=(0.70, 0.80, 1.00), seed=7)
    b.sphere((0, 0, 0), 2.0, b.lambertian(texture=b.image_texture(small)))
    b.sphere((0, -1002.0, 0), 1000.0, b.lambertian(color=(0.5, 0.5, 0.5)))
    scene = b.build()
    cam = camera_lib.make_camera(
        lookfrom=(0, 0, 12), lookat=(0, 0, 0), vfov=22.0,
        aspect_ratio=W / H)

    # 1. Target at the true atlas.
    acc, _ = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, jnp.uint32(99), width=W, height=H, spp=SPP,
        samples_per_pass=1, max_depth=DEPTH, t_min=1e-3,
        differentiable=True))(scene, cam)
    target = jnp.asarray(vec3.to_numpy(acc).astype(np.float32) / SPP)

    true_atlas = np.asarray(scene.atlas)

    # MC noise floor: loss at the TRUE params under an unseen seed.
    tparams, _ = diff.split_params(scene, ("atlas",))
    floor = float(diff.render_value_and_grad(
        tparams, scene, cam, target, jnp.uint32(555), width=W, height=H,
        spp=SPP, samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)[0])

    # Texel observability = gradient weight at the true params.  Texels
    # below 10% of the max weight are touched only by rare secondary
    # bounces: their gradient is MC noise and no optimizer can recover
    # them from this viewpoint — report them separately, don't hide them.
    g0 = diff.render_value_and_grad(
        tparams, scene, cam, target, jnp.uint32(556), width=W, height=H,
        spp=SPP, samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)[1]["atlas"]
    wt = np.abs(np.asarray(g0)).sum(-1)
    observed = wt > 0.1 * wt.max()
    print(f"well-observed texels: {observed.mean():.1%} "
          f"(weight >= 10% of max)")

    # 2. Perturb.
    rng = np.random.default_rng(0)
    pert = np.clip(true_atlas * rng.uniform(0.2, 2.5, true_atlas.shape)
                   + rng.uniform(0.0, 0.25, true_atlas.shape),
                   0.0, 1.0).astype(np.float32)
    pscene = scene.replace(atlas=jnp.asarray(pert))
    err0 = float(np.abs(pert - true_atlas)[observed].mean())

    # 3. Optimize (atlas only).  adam eps acts as the gradient-noise
    # floor: per-texel gradients span ~100x by visibility, and default
    # eps lets adam normalize barely-sampled texels' MC-noise gradients
    # into full-size random-walk steps (measured: unweighted error WORSE
    # after optimization).  eps ~ the noise-texel gradient scale keeps
    # their steps proportional to signal.
    import optax

    opt = optax.adam(2e-2, eps=1e-5)
    params = {"atlas": jnp.asarray(pert)}
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(params, opt_state, seed):
        loss, grads = jax.value_and_grad(diff.render_loss)(
            params, pscene, cam, target, seed, width=W, height=H, spp=SPP,
            samples_per_pass=1, max_depth=DEPTH, t_min=1e-3)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    t0 = time.perf_counter()
    for k in range(steps):
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.uint32(1000 + k))
        if k % 20 == 0 or k == steps - 1:
            losses.append((k, float(loss)))
            print(f"step {k:4d}  loss {float(loss):.6f}")
    wall = time.perf_counter() - t0

    got = np.asarray(params["atlas"])
    err1 = float(np.abs(got - true_atlas)[observed].mean())
    err_unobs = float(np.abs(got - true_atlas)[~observed].mean()) \
        if (~observed).any() else 0.0
    first_loss, final_loss = losses[0][1], losses[-1][1]
    print(f"\nloss {first_loss:.6f} -> {final_loss:.6f} (floor {floor:.6f})")
    print(f"mean |atlas - true| over observed texels: {err0:.4f} -> {err1:.4f}"
          f" ({err0/max(err1,1e-9):.1f}x); unobserved stay at {err_unobs:.4f}")
    print(f"{steps} steps in {wall:.1f} s ({wall/steps*1000:.0f} ms/step)")

    rec = {
        "config": f"earth-sphere {W}x{H} spp{SPP} depth{DEPTH} "
                  f"tex{TEX[0]}x{TEX[1]} adam lr=2e-2 eps=1e-5 trainable=atlas",
        "steps": steps,
        "backend": jax.default_backend(),
        "loss_curve": losses,
        "observed_texel_fraction": round(float(observed.mean()), 4),
        "atlas_mean_abs_err_observed": {"perturbed": round(err0, 5),
                                        "recovered": round(err1, 5)},
        "atlas_mean_abs_err_unobserved_after": round(err_unobs, 5),
        "seconds": round(wall, 1),
        "mc_noise_floor_at_true_params": round(floor, 6),
    }
    if not cpu:
        (ROOT / "TRAIN_DEMO_ATLAS.json").write_text(json.dumps(rec, indent=1))
        print("wrote TRAIN_DEMO_ATLAS.json")

    if cpu:
        assert final_loss < 0.6 * first_loss, (final_loss, first_loss)
        assert err1 < err0, (err0, err1)
    else:
        assert final_loss < 2.0 * floor, (final_loss, floor)
        assert err1 * 3.0 <= err0, (err0, err1)
    print("PASS")


if __name__ == "__main__":
    main()
