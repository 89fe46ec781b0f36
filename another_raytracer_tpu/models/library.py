"""The nine canonical scenes.

Faithful re-creations of ``scene_manager``'s builders and per-scene camera /
background table (reference: src/scene_manager.cpp:13-355).  Each function
returns ``(SceneData, cam_params dict)`` where cam_params feeds
``ops.camera.make_camera`` (vup=(0,1,0), focus_dist=10, shutter [0,1] fixed
app-wide at src/main.cpp:33-35).

Randomized scenes (random, final) use the builder's seeded host RNG; geometry
is deterministic per seed, matching the reference's deterministic-per-run
construction (SURVEY appendix).
"""

from __future__ import annotations

import enum

import numpy as np

from another_raytracer_tpu.models import mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder, SceneData
from another_raytracer_tpu.utils import assets, imageio

SKY = (0.70, 0.80, 1.00)
BLACK = (0.0, 0.0, 0.0)


class SceneAlias(enum.IntEnum):
    """scene_alias enum values 1..9 (scene_manager.h:16-27)."""

    RANDOM = 1
    TWO_SPHERES = 2
    TWO_PERLIN_SPHERES = 3
    EARTH = 4
    SIMPLE_LIGHT = 5
    CORNELL_BOX = 6
    CORNELL_SMOKE = 7
    FINAL = 8
    MESH = 9


def _cam(lookfrom, lookat, vfov, aperture=0.0):
    return dict(
        lookfrom=lookfrom, lookat=lookat, vup=(0.0, 1.0, 0.0), vfov=vfov,
        aperture=aperture, focus_dist=10.0, time0=0.0, time1=1.0,
    )


def random_scene(seed: int = 1234, **build_kw):
    """~500 random spheres over a checkered ground (scene_manager.cpp:13-64).
    Diffuse spheres are added twice: once static, once as a motion-blurred
    duplicate rising by rand(0,0.5) — both are in the reference list.
    ``build_kw`` forwards to SceneBuilder.build (accel knobs for A/Bs)."""
    b = SceneBuilder(background=SKY, seed=seed)
    ground = b.lambertian(texture=b.checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    b.sphere((0, -1000, 0), 1000, ground)

    for a in range(-11, 11):
        for c in range(-11, 11):
            choose = b.rand.uniform()
            center = np.array([a + 0.9 * b.rand.uniform(), 0.2, c + 0.9 * b.rand.uniform()])
            if np.linalg.norm(center - np.array([4.0, 0.2, 0.0])) <= 0.9:
                continue
            if choose < 0.8:
                albedo = b.rand.uniform(0, 1, 3) * b.rand.uniform(0, 1, 3)
                mat = b.lambertian(color=tuple(albedo))
                b.sphere(center, 0.2, mat)
                center2 = center + np.array([0.0, b.rand.uniform(0, 0.5), 0.0])
                b.moving_sphere(center, center2, 0.0, 1.0, 0.2, mat)
            elif choose < 0.95:
                albedo = tuple(b.rand.uniform(0.5, 1, 3))
                mat = b.metal(albedo, fuzz=b.rand.uniform(0, 0.5))
                b.sphere(center, 0.2, mat)
            else:
                b.sphere(center, 0.2, b.dielectric(1.5))

    b.sphere((0, 1, 0), 1.0, b.dielectric(1.5))
    b.sphere((-4, 1, 0), 1.0, b.lambertian(color=(0.4, 0.2, 0.1)))
    b.sphere((4, 1, 0), 1.0, b.metal((0.7, 0.6, 0.5), 0.0))
    # Sphere-tree accel tuned on-chip (scripts/ab_random_accel.py,
    # 2026-08-21): leaf 32 / block 8192 measured 84.7 ms vs 98.4 at the
    # global leaf16/blk2048 default on the 400x225 spp8 bench (leaf 48 and
    # blk 4096 within noise of this; leaf 8 / blk 1024 clearly worse).
    build_kw = {"bvh_leaf_size": 32, "bvh_block": 8192, **build_kw}
    return b.build(**build_kw), _cam((13, 2, 3), (0, 0, 0), 20.0, aperture=0.1)


def two_spheres(seed: int = 1234):
    b = SceneBuilder(background=SKY, seed=seed)
    checker = b.checker_texture((0.2, 0.3, 0.1), (0.9, 0.9, 0.9))
    b.sphere((0, -10, 0), 10, b.lambertian(texture=checker))
    b.sphere((0, 10, 0), 10, b.lambertian(texture=checker))
    return b.build(), _cam((13, 2, 3), (0, 0, 0), 20.0)


def two_perlin_spheres(seed: int = 1234):
    b = SceneBuilder(background=SKY, seed=seed)
    pertext = b.noise_texture(4.0)
    b.sphere((0, -1000, 0), 1000, b.lambertian(texture=pertext))
    b.sphere((0, 2, 0), 2, b.lambertian(texture=pertext))
    return b.build(), _cam((13, 2, 3), (0, 0, 0), 20.0)


def earth(seed: int = 1234):
    b = SceneBuilder(background=SKY, seed=seed)
    path = assets.earthmap_path()
    img = imageio.load_image(path) if path else None
    b.sphere((0, 0, 0), 2, b.lambertian(texture=b.image_texture(img)))
    return b.build(), _cam((13, 2, 3), (0, 0, 0), 20.0)


def simple_light(seed: int = 1234):
    b = SceneBuilder(background=BLACK, seed=seed)
    pertext = b.noise_texture(4.0)
    b.sphere((0, -1000, 0), 1000, b.lambertian(texture=pertext))
    b.sphere((0, 2, 0), 2, b.lambertian(texture=pertext))
    b.xy_rect(3, 5, 1, 3, -2, b.diffuse_light(color=(4, 4, 4)))
    return b.build(), _cam((26, 3, 6), (0, 2, 0), 20.0)


def _cornell_walls(b: SceneBuilder, light_rect, light_emit):
    red = b.lambertian(color=(0.65, 0.05, 0.05))
    white = b.lambertian(color=(0.73, 0.73, 0.73))
    green = b.lambertian(color=(0.12, 0.45, 0.15))
    light = b.diffuse_light(color=light_emit)
    b.yz_rect(0, 555, 0, 555, 555, green)
    b.yz_rect(0, 555, 0, 555, 0, red)
    b.xz_rect(*light_rect, 554, light)
    return white


def cornell_box(seed: int = 1234, **build_kw):
    """Cornell box with two rotated boxes (scene_manager.cpp:112-139)."""
    b = SceneBuilder(background=BLACK, seed=seed)
    white = _cornell_walls(b, (213, 343, 227, 332), (15, 15, 15))
    b.xz_rect(0, 555, 0, 555, 0, white)
    b.xz_rect(0, 555, 0, 555, 555, white)
    b.xy_rect(0, 555, 0, 555, 555, white)
    xf1 = b.transform(rotate_y_deg=15, translate=(265, 0, 295))
    b.box((0, 0, 0), (165, 330, 165), white, xform=xf1)
    xf2 = b.transform(rotate_y_deg=-18, translate=(130, 0, 65))
    b.box((0, 0, 0), (165, 165, 165), white, xform=xf2)
    return b.build(**build_kw), _cam((278, 278, -800), (278, 278, 0), 40.0)


def cornell_smoke(seed: int = 1234):
    """Cornell box with the boxes replaced by smoke volumes
    (scene_manager.cpp:141-169; dimmer, larger light)."""
    b = SceneBuilder(background=BLACK, seed=seed)
    white = _cornell_walls(b, (113, 443, 127, 432), (7, 7, 7))
    b.xz_rect(0, 555, 0, 555, 555, white)
    b.xz_rect(0, 555, 0, 555, 0, white)
    b.xy_rect(0, 555, 0, 555, 555, white)
    xf1 = b.transform(rotate_y_deg=15, translate=(265, 0, 295))
    b.constant_medium_box((0, 0, 0), (165, 330, 165), 0.01, color=(0, 0, 0), xform=xf1)
    xf2 = b.transform(rotate_y_deg=-18, translate=(130, 0, 65))
    b.constant_medium_box((0, 0, 0), (165, 165, 165), 0.01, color=(1, 1, 1), xform=xf2)
    return b.build(), _cam((278, 278, -800), (278, 278, 0), 40.0)


def final_scene(seed: int = 1234, **build_kw):
    """The Next Week final scene (scene_manager.cpp:171-234).
    ``build_kw`` forwards to SceneBuilder.build (bvh_block etc. for A/Bs)."""
    # leaf 48 measured best for this scene's incoherent bounce packets
    # (in-process A/B, v5e, 240x180 spp8: 182.8 ms vs 191 @32, 211 @16);
    # the mesh scene is neutral 16 vs 32, so the global default stays 16.
    build_kw.setdefault("bvh_leaf_size", 48)
    b = SceneBuilder(background=BLACK, seed=seed)
    ground = b.lambertian(color=(0.48, 0.83, 0.53))
    for i in range(20):
        for j in range(20):
            w = 100.0
            x0 = -1000.0 + i * w
            z0 = -1000.0 + j * w
            y1 = b.rand.uniform(1, 101)
            b.box((x0, 0.0, z0), (x0 + w, y1, z0 + w), ground)

    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))

    center1 = np.array([400.0, 400.0, 200.0])
    b.moving_sphere(center1, center1 + np.array([30.0, 0, 0]), 0, 1, 50,
                    b.lambertian(color=(0.7, 0.3, 0.1)))
    b.sphere((260, 150, 45), 50, b.dielectric(1.5))
    b.sphere((0, 150, 145), 50, b.metal((0.8, 0.8, 0.9), 1.0))

    # Subsurface-ish: glass boundary + interior blue medium.
    b.sphere((360, 150, 145), 70, b.dielectric(1.5))
    b.constant_medium_sphere((360, 150, 145), 70, 0.2, color=(0.2, 0.4, 0.9))
    # Global thin mist: giant glass boundary sphere is NOT itself added as a
    # surface in the reference — only its medium is (scene_manager.cpp:212-213).
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))

    path = assets.earthmap_path()
    img = imageio.load_image(path) if path else None
    b.sphere((400, 200, 400), 100, b.lambertian(texture=b.image_texture(img)))
    b.sphere((220, 280, 300), 80, b.lambertian(texture=b.noise_texture(0.1)))

    white = b.lambertian(color=(0.73, 0.73, 0.73))
    xf = b.transform(rotate_y_deg=15, translate=(-100, 270, 395))
    for _ in range(1000):
        b.sphere(b.rand.uniform(0, 165, 3), 10, white, xform=xf)
    return b.build(**build_kw), _cam((478, 278, -600), (278, 278, 0), 40.0)


# Per-model camera presets from the reference's commented-out alternates
# (scene_manager.cpp:334-342); the active capsule view is 344-346.
_MESH_CAMERAS = {
    "dino": ((0, 15, 25), (0, 10, 0)),
    "cow": ((4, 2, 6), (2, 0, 0)),
}


def mesh_scene(seed: int = 1234, obj_path=None, **build_kw):
    """Textured capsule mesh + light + global mist (scene_manager.cpp:236-258,
    camera table 330-348)."""
    from pathlib import Path

    b = SceneBuilder(background=SKY, seed=seed)
    path = obj_path or assets.capsule_obj_path()
    if path is None:
        raise FileNotFoundError("cannot parse input obj file! (no mesh asset found)")
    mesh = mesh_lib.parse(path)
    mesh_lib.add_to_builder(b, mesh)
    b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
    b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
    lookfrom, lookat = _MESH_CAMERAS.get(Path(path).stem, ((2, 2, 1), (0, 0, 0)))
    # Packet-kernel block tuned on-chip (scripts/ab_mesh_block.py,
    # 2026-08-21, capsule 720x540 spp16): blk 4096 = 526 ms vs 562 at 2048
    # and 554 at 8192 (the final scene prefers its default 2048).
    build_kw = {"bvh_block": 4096, **build_kw}
    return b.build(**build_kw), _cam(lookfrom, lookat, 75.0)


_BUILDERS = {
    SceneAlias.RANDOM: random_scene,
    SceneAlias.TWO_SPHERES: two_spheres,
    SceneAlias.TWO_PERLIN_SPHERES: two_perlin_spheres,
    SceneAlias.EARTH: earth,
    SceneAlias.SIMPLE_LIGHT: simple_light,
    SceneAlias.CORNELL_BOX: cornell_box,
    SceneAlias.CORNELL_SMOKE: cornell_smoke,
    SceneAlias.FINAL: final_scene,
    SceneAlias.MESH: mesh_scene,
}


def build(alias, seed: int = 1234):
    """scene_manager::build equivalent; raises on unknown alias
    (scene_manager.cpp:350-351)."""
    try:
        alias = SceneAlias(int(alias))
    except ValueError as e:
        raise ValueError("unknown scene requested!") from e
    return _BUILDERS[alias](seed=seed)
