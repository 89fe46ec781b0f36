"""Texture evaluation, emission, and branchless material scatter.

The reference dispatches scatter through ``material::scatter`` virtual calls
(src/rendering/material.h) and textures through ``texture::value``
(src/rendering/texture.h).  Here both are data: every ray evaluates the small
set of closed-form candidates and a masked select keyed on the material /
texture kind picks the winner — no divergent control flow, pure VPU lanes.

Scatter contracts (reference locations):
  * lambertian: dir = normal + random_unit_vector, near-zero fallback to the
    normal, albedo from texture (material.h:20-43);
  * metal: reflect(unit(d), n) + fuzz * random_in_unit_sphere, absorbed when
    the scattered dir points below the surface (material.h:45-61);
  * dielectric: attenuation 1, ratio 1/ir vs ir by front_face, TIR test,
    Schlick reflectance vs a uniform (material.h:63-99);
  * diffuse_light: never scatters, emits its texture (material.h:101-118);
  * isotropic: uniform scatter in the unit ball (material.h:120-135).
"""

from __future__ import annotations

import jax.numpy as jnp

from another_raytracer_tpu.models import scene as scene_lib
from another_raytracer_tpu.ops import rng, vecmath
from another_raytracer_tpu.ops.intersect import HitRecord

PERLIN_N = scene_lib.PERLIN_POINT_COUNT


# --------------------------------------------------------------------------
# Perlin noise (vectorized port of the behavior of src/rendering/perlin.h)
# --------------------------------------------------------------------------


def perlin_noise(scene, perlin_ids, p):
    """Gradient Perlin noise per ray.

    perlin_ids: [B] int32 index of the perlin instance (one per noise
    texture, matching the reference where each noise_texture owns its own
    tables).  p: [B,3].  Returns [B] in roughly [-1, 1].

    Lattice hash perm_x[i&255] ^ perm_y[j&255] ^ perm_z[k&255] and trilinear
    Hermite-smoothed gradient interpolation exactly as perlin.h:29-96.
    """
    pid = jnp.clip(perlin_ids, 0, scene.per_perm.shape[0] - 1)
    fl = jnp.floor(p)
    uvw = p - fl
    ijk = fl.astype(jnp.int32)

    # Hermite smoothing u*u*(3-2u) (perlin.h:80-82).
    smooth = uvw * uvw * (3.0 - 2.0 * uvw)

    perm = scene.per_perm  # [Q,3,256]
    ranvec_flat = scene.per_ranvec.reshape(-1, 3)  # [Q*256,3]

    accum = jnp.zeros(p.shape[:-1], p.dtype)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                px = perm[pid, 0, (ijk[..., 0] + di) & (PERLIN_N - 1)]
                py = perm[pid, 1, (ijk[..., 1] + dj) & (PERLIN_N - 1)]
                pz = perm[pid, 2, (ijk[..., 2] + dk) & (PERLIN_N - 1)]
                g = ranvec_flat[pid * PERLIN_N + (px ^ py ^ pz)]  # [B,3]
                weight_v = uvw - jnp.array([di, dj, dk], p.dtype)
                w = (
                    (di * smooth[..., 0] + (1 - di) * (1.0 - smooth[..., 0]))
                    * (dj * smooth[..., 1] + (1 - dj) * (1.0 - smooth[..., 1]))
                    * (dk * smooth[..., 2] + (1 - dk) * (1.0 - smooth[..., 2]))
                )
                accum = accum + w * jnp.sum(g * weight_v, axis=-1)
    return accum


def perlin_turb(scene, perlin_ids, p, depth: int = 7):
    """7-octave fBm |accum| (perlin.h:42-54) — part of the reference API
    surface (unused by the stock noise_texture but kept for parity)."""
    accum = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    q = p
    for _ in range(depth):
        accum = accum + weight * perlin_noise(scene, perlin_ids, q)
        weight *= 0.5
        q = q * 2.0
    return jnp.abs(accum)


# --------------------------------------------------------------------------
# Texture evaluation
# --------------------------------------------------------------------------


def texture_value(scene, tex_ids, u, v, tu, tv, p):
    """Evaluate the texture table for a batch.

    (u, v) are the raw surface parameters (barycentric for triangles) feeding
    TEX_BARYCENTRIC; (tu, tv) are the image-sampling coordinates — for
    triangles the barycentric blend of vertex texcoords (the reference's
    barycentric_image_texture, texture.h:135-154), identical to (u, v) for
    every other primitive.
    """
    tid = jnp.clip(tex_ids, 0, scene.tex_kind.shape[0] - 1)
    kind = scene.tex_kind[tid]
    ca = scene.tex_ca[tid]
    cb = scene.tex_cb[tid]
    cc = scene.tex_cc[tid]

    out = ca  # TEX_SOLID

    # Checker: sign of sin(10x)sin(10y)sin(10z) (texture.h:39-45).
    sines = jnp.sin(10.0 * p[..., 0]) * jnp.sin(10.0 * p[..., 1]) * jnp.sin(10.0 * p[..., 2])
    checker = jnp.where((sines < 0.0)[..., None], cb, ca)
    out = jnp.where((kind == scene_lib.TEX_CHECKER)[..., None], checker, out)

    # Perlin: 0.5*(1+noise(scale*p)) grayscale (texture.h:57-59).
    scale = scene.tex_scale[tid]
    noise = perlin_noise(scene, scene.tex_aux[tid], scale[..., None] * p)
    noise_col = (0.5 * (1.0 + noise))[..., None] * jnp.ones((3,), p.dtype)
    out = jnp.where((kind == scene_lib.TEX_NOISE)[..., None], noise_col, out)

    # Image: clamp u, flip v, nearest texel (texture.h:88-111).
    img = jnp.clip(scene.tex_aux[tid], 0, scene.img_off.shape[0] - 1)
    w = scene.img_w[img]
    h = scene.img_h[img]
    cu = jnp.clip(tu, 0.0, 1.0)
    cv = 1.0 - jnp.clip(tv, 0.0, 1.0)
    i = jnp.minimum((cu * w.astype(p.dtype)).astype(jnp.int32), w - 1)
    j = jnp.minimum((cv * h.astype(p.dtype)).astype(jnp.int32), h - 1)
    texel = scene.atlas[scene.img_off[img] + j * w + i]
    out = jnp.where((kind == scene_lib.TEX_IMAGE)[..., None], texel, out)

    # Barycentric color blend u*A + v*B + (1-u-v)*C (texture.h:121-133).
    bary = u[..., None] * ca + v[..., None] * cb + (1.0 - u - v)[..., None] * cc
    out = jnp.where((kind == scene_lib.TEX_BARYCENTRIC)[..., None], bary, out)
    return out


# --------------------------------------------------------------------------
# Emission + scatter
# --------------------------------------------------------------------------


def emitted(scene, rec: HitRecord):
    """diffuse_light emits its texture; everything else black
    (material.h:12-14, 112-114)."""
    kind = scene.mat_kind[rec.mat]
    emit = texture_value(scene, scene.mat_tex[rec.mat], rec.u, rec.v, rec.tu, rec.tv, rec.p)
    return jnp.where((kind == scene_lib.MAT_DIFFUSE_LIGHT)[..., None], emit, 0.0)


def scatter(scene, rec: HitRecord, d_in, pixel_ids, sample_ids, bounce, seed):
    """Branchless scatter for a batch of hits.

    Returns (scatter_dir [B,3] — NOT normalized, matching the reference's
    un-normalized scattered rays; attenuation [B,3]; scatter_ok [B]).
    """
    kind = scene.mat_kind[rec.mat]
    n = rec.normal

    u1, u2 = rng.uniform2(seed, pixel_ids, sample_ids, bounce, rng.DIM_SCATTER_A)
    u3, u4 = rng.uniform2(seed, pixel_ids, sample_ids, bounce, rng.DIM_SCATTER_B)

    unit_d = vecmath.unit(d_in)
    rand_unit = vecmath.unit_vector_from_uniforms(u1, u2)
    rand_in_sphere = rand_unit * jnp.cbrt(u3)[..., None]

    # lambertian (material.h:29-36)
    lam_dir = n + rand_unit
    lam_dir = jnp.where(vecmath.near_zero(lam_dir)[..., None], n, lam_dir)

    # metal (material.h:52-55)
    fuzz = scene.mat_fuzz[rec.mat]
    met_dir = vecmath.reflect(unit_d, n) + fuzz[..., None] * rand_in_sphere
    met_ok = vecmath.dot(met_dir, n) > 0.0

    # dielectric (material.h:70-99)
    ir = scene.mat_ir[rec.mat]
    ratio = jnp.where(rec.front_face, 1.0 / ir, ir)
    cos_theta = jnp.minimum(vecmath.dot(-unit_d, n), 1.0)
    # 1e-12 floor: finite grad at grazing incidence (see vecmath.refract).
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    cannot_refract = ratio * sin_theta > 1.0
    r0 = (1.0 - ratio) / (1.0 + ratio)
    r0 = r0 * r0
    reflectance = r0 + (1.0 - r0) * (1.0 - cos_theta) ** 5
    reflect_dir = vecmath.reflect(unit_d, n)
    refract_dir = vecmath.refract(unit_d, n, ratio)
    die_reflect = cannot_refract | (reflectance > u4)
    die_dir = jnp.where(die_reflect[..., None], reflect_dir, refract_dir)

    # isotropic (material.h:128)
    iso_dir = rand_in_sphere

    albedo = texture_value(scene, scene.mat_tex[rec.mat], rec.u, rec.v, rec.tu, rec.tv, rec.p)
    ones = jnp.ones_like(albedo)

    k = kind[..., None]
    direction = jnp.where(k == scene_lib.MAT_METAL, met_dir, lam_dir)
    direction = jnp.where(k == scene_lib.MAT_DIELECTRIC, die_dir, direction)
    direction = jnp.where(k == scene_lib.MAT_ISOTROPIC, iso_dir, direction)

    attenuation = jnp.where(k == scene_lib.MAT_DIELECTRIC, ones, albedo)

    ok = jnp.ones_like(met_ok)
    ok = jnp.where(kind == scene_lib.MAT_METAL, met_ok, ok)
    ok = jnp.where(kind == scene_lib.MAT_DIFFUSE_LIGHT, False, ok)
    return direction, attenuation, ok
