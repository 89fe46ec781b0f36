"""Dump optimized HLO of the mesh forward render to identify hot fusions."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
from another_raytracer_tpu.models import mesh as mesh_lib
from another_raytracer_tpu.models.scene import SceneBuilder
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib
from another_raytracer_tpu.utils import assets

W, H, SPP, DEPTH = 240, 180, 8, 6
b = SceneBuilder(background=(0.7, 0.8, 1.0), seed=1234)
mesh_lib.add_to_builder(b, mesh_lib.parse(assets.capsule_obj_path()))
b.xz_rect(123, 423, 147, 412, 554, b.diffuse_light(color=(7, 7, 7)))
b.constant_medium_sphere((0, 0, 0), 5000, 1e-4, color=(1, 1, 1))
scene = b.build(bvh=True)
cam = camera_lib.make_camera(
    aspect_ratio=W / H, lookfrom=(2, 2, 1), lookat=(0, 0, 0),
    vup=(0, 1, 0), vfov=75.0, aperture=0.0, focus_dist=10.0,
    time0=0.0, time1=1.0)
f = jax.jit(lambda s, c: render_lib.render_radiance(
    s, c, jnp.uint32(0), width=W, height=H, spp=SPP,
    samples_per_pass=1, max_depth=DEPTH, t_min=1e-3))
txt = f.lower(scene, cam).compile().as_text()
Path("/tmp/mesh_hlo.txt").write_text(txt)
print("wrote /tmp/mesh_hlo.txt", len(txt))
