"""Vectorized closest-hit over the flat SoA scene.

The reference's hot path is virtual dispatch through ``hittable::hit``
recursion (hittable_list.cpp:5-19 + bvh.cpp:44-52).  TPU-native design:
every primitive kind is intersected for a whole ray batch at once as fused
broadcast arithmetic ([B, N] lanes feeding a min-reduction), chunked over
primitives with ``lax.scan`` so intermediates stay fusion-sized.  The winner
(t, kind, index) per ray is found first with cheap arithmetic only; the full
hit record (point, normal, UV, material) is then *recomputed only for the
winning primitive* per ray — a [B]-sized gather instead of a [B, N] payload.

Instancing: primitives carry a transform id; rays are moved into object space
with the gathered inverse transform — the vectorized form of
``rotate_y::hit``/``translate::hit`` (reference: src/engine/hittable.cpp).

Behavioral contracts preserved (with reference locations):
  * sphere: half-b quadratic, nearest root in (t_min, t_max) (sphere.h:39-65),
    UV from the object-space outward normal (sphere.h:24-37);
  * moving sphere: center lerped by ray time (moving_sphere.h:29-31), UV left
    at 0 — the reference never fills it (moving_sphere.h:33-58);
  * rect: plane solve + inclusive 2D bound check (aarect.cpp);
  * triangle: scratchapixel geometric test with area-ratio barycentrics
    (triangle.h:22-87).  DIVERGENCE: the reference leaves the triangle normal
    unnormalized in hit_record (the raw cross product), which skews its
    lambertian lobes by triangle area; we normalize, which is the physically
    intended behavior.  Documented in PARITY.md;
  * constant medium: boundary entry/exit interval then exponential free-flight
    sampling (constant_medium.h:42-80), with the analytic two-root interval
    replacing the double hittable::hit probe.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from another_raytracer_tpu.models import scene as scene_lib
from another_raytracer_tpu.ops import vecmath

BIG = jnp.float32(3e37)  # effectively +infinity for t comparisons
MEDIUM_REHIT_EPS = 1e-4  # reference: constant_medium.h:47 second-probe offset

# Primitive chunk size for the lax.scan over large primitive arrays.  Each
# chunk produces [B, CHUNK] fused intermediates.
PRIM_CHUNK = 512


@flax.struct.dataclass
class HitRecord:
    t: jnp.ndarray  # [B]
    p: jnp.ndarray  # [B,3] world-space hit point
    normal: jnp.ndarray  # [B,3] unit, faced toward the incoming ray
    front_face: jnp.ndarray  # [B] bool
    mat: jnp.ndarray  # [B] int32 material id
    u: jnp.ndarray  # [B] raw surface parameter (barycentric u for triangles)
    v: jnp.ndarray  # [B]
    tu: jnp.ndarray  # [B] texture coordinate (blended texcoord for triangles)
    tv: jnp.ndarray  # [B]


def _gather_xf(scene, xf_ids):
    """Gather world-from-object transforms; returns (rot [N,3,3], trans [N,3])."""
    return scene.xf_rot[xf_ids], scene.xf_trans[xf_ids]


def _to_object(o, d, rot, trans):
    """Move world rays into per-primitive object space.

    o,d: [B,3]; rot: [N,3,3] world-from-object; trans: [N,3].
    Returns o_obj, d_obj of shape [B,N,3]:  o' = R^T (o - t), d' = R^T d.
    """
    oc = o[:, None, :] - trans[None, :, :]
    o_obj = jnp.einsum("nji,bnj->bni", rot, oc)
    d_obj = jnp.einsum("nji,bj->bni", rot, d)
    return o_obj, d_obj


def _identity_xf(scene: scene_lib.SceneData) -> bool:
    """Static check: scene has only the identity transform."""
    return scene.xf_rot.shape[0] == 1


# --------------------------------------------------------------------------
# Per-kind t computation.  Each returns (t [B, N], valid [B, N]).
# --------------------------------------------------------------------------


def _sphere_t(scene, sl, o, d, time, t_min, t_max):
    """Quadratic sphere test against time-lerped centers (sphere.h:39-65,
    moving_sphere.h:29-58).  ``sl`` slices the sphere arrays (chunking)."""
    c0 = scene.sph_c0[sl]
    c1 = scene.sph_c1[sl]
    t0 = scene.sph_t0[sl]
    t1 = scene.sph_t1[sl]
    r = scene.sph_r[sl]
    if not _identity_xf(scene):
        rot, trans = _gather_xf(scene, scene.sph_xf[sl])
        o_b, d_b = _to_object(o, d, rot, trans)  # [B,N,3]
    else:
        o_b, d_b = o[:, None, :], d[:, None, :]

    # center(time): static spheres have c1 == c0 so the lerp is inert.
    frac = (time[:, None] - t0[None, :]) / (t1 - t0)[None, :]
    center = c0[None, :, :] + frac[..., None] * (c1 - c0)[None, :, :]

    oc = o_b - center  # [B,N,3]
    a = jnp.sum(d_b * d_b, axis=-1)  # [B,N] (or [B,1] when no xform)
    half_b = jnp.sum(oc * d_b, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - (r * r)[None, :]
    disc = half_b * half_b - a * c
    hit_disc = disc > 0.0
    # where-guard before sqrt: lanes with disc <= 0 are discarded by `valid`,
    # but sqrt'(0) = inf would still NaN-poison reverse-mode cotangents.
    sqrtd = jnp.sqrt(jnp.where(hit_disc, disc, 1.0))
    root1 = (-half_b - sqrtd) / a
    root2 = (-half_b + sqrtd) / a
    r1_ok = (root1 > t_min) & (root1 < t_max)
    root = jnp.where(r1_ok, root1, root2)
    valid = hit_disc & (root > t_min) & (root < t_max)
    return root, valid


def _rect_t(scene, sl, o, d, t_min, t_max):
    """Axis-rect plane solve + inclusive bound check (aarect.cpp)."""
    axis = scene.rect_axis[sl]  # [N]
    k = scene.rect_k[sl]
    lo = scene.rect_lo[sl]  # [N,2]
    hi = scene.rect_hi[sl]
    if not _identity_xf(scene):
        rot, trans = _gather_xf(scene, scene.rect_xf[sl])
        o_b, d_b = _to_object(o, d, rot, trans)  # [B,N,3]
    else:
        o_b, d_b = o[:, None, :], d[:, None, :]

    onehot = jax.nn.one_hot(axis, 3, dtype=o.dtype)  # [N,3]
    o_ax = jnp.sum(o_b * onehot[None], axis=-1)  # [B,N]
    d_ax = jnp.sum(d_b * onehot[None], axis=-1)
    parallel = d_ax == 0.0
    # Parallel lanes are invalid; guard the divide so its infinite forward
    # value can't NaN reverse-mode cotangents (0 * inf).
    t = jnp.where(parallel, BIG, (k[None, :] - o_ax) / jnp.where(parallel, 1.0, d_ax))

    # free axes in ascending order: axis 0 -> (1,2), 1 -> (0,2), 2 -> (0,1)
    au = jnp.where(axis == 0, 1, 0)
    av = jnp.where(axis == 2, 1, 2)
    oh_u = jax.nn.one_hot(au, 3, dtype=o.dtype)
    oh_v = jax.nn.one_hot(av, 3, dtype=o.dtype)
    pu = jnp.sum(o_b * oh_u[None], -1) + t * jnp.sum(d_b * oh_u[None], -1)
    pv = jnp.sum(o_b * oh_v[None], -1) + t * jnp.sum(d_b * oh_v[None], -1)

    inside = (pu >= lo[None, :, 0]) & (pu <= hi[None, :, 0]) & \
             (pv >= lo[None, :, 1]) & (pv <= hi[None, :, 1])
    valid = inside & (t > t_min) & (t < t_max) & ~parallel
    return t, valid


def _triangle_t(scene, sl, o, d, t_min, t_max):
    """Scratchapixel-style plane + edge half-plane test (triangle.h:22-87).
    Returns t only; barycentrics are recomputed for the winner."""
    v0 = scene.tri_v0[sl]
    v1 = scene.tri_v1[sl]
    v2 = scene.tri_v2[sl]
    if not _identity_xf(scene):
        rot, trans = _gather_xf(scene, scene.tri_xf[sl])
        o_b, d_b = _to_object(o, d, rot, trans)
    else:
        o_b, d_b = o[:, None, :], d[:, None, :]

    n = jnp.cross(v1 - v0, v2 - v0)  # [N,3] unnormalized plane normal
    ndotd = jnp.sum(n[None] * d_b, axis=-1)  # [B,N]
    ndoto = jnp.sum(n[None] * o_b, axis=-1)
    parallel = ndotd == 0.0
    t = jnp.where(
        parallel, BIG,
        (jnp.sum(n * v0, -1)[None] - ndoto) / jnp.where(parallel, 1.0, ndotd),
    )

    p = o_b + t[..., None] * d_b  # [B,N,3]
    w0 = jnp.sum(n[None] * jnp.cross(v1 - v0, p - v0[None]), -1)
    w1 = jnp.sum(n[None] * jnp.cross(v2 - v1, p - v1[None]), -1)
    w2 = jnp.sum(n[None] * jnp.cross(v0 - v2, p - v2[None]), -1)

    valid = (
        (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
        & (t > t_min) & (t < t_max) & ~parallel
    )
    return t, valid


def _medium_interval(scene, o, d):
    """Boundary entry/exit interval (t1, t2, boundary_hit) for all media.

    Analytic equivalent of the reference's two hittable::hit probes over
    (-inf, inf) then (t1+1e-4, inf) (constant_medium.h:42-47).
    """
    kind = scene.med_kind  # [Nm]
    a3 = scene.med_a
    b3 = scene.med_b
    if not _identity_xf(scene):
        rot, trans = _gather_xf(scene, scene.med_xf)
        o_b, d_b = _to_object(o, d, rot, trans)  # [B,Nm,3]
    else:
        o_b = jnp.broadcast_to(o[:, None, :], (o.shape[0], kind.shape[0], 3))
        d_b = jnp.broadcast_to(d[:, None, :], (o.shape[0], kind.shape[0], 3))

    # Sphere boundary: both quadratic roots.
    oc = o_b - a3[None]
    qa = jnp.sum(d_b * d_b, -1)
    half_b = jnp.sum(oc * d_b, -1)
    qc = jnp.sum(oc * oc, -1) - (b3[:, 0] * b3[:, 0])[None]
    disc = half_b * half_b - qa * qc
    s_ok = disc > 0.0
    sq = jnp.sqrt(jnp.where(s_ok, disc, 1.0))  # grad-safe (see _sphere_t)
    s_t1 = (-half_b - sq) / qa
    s_t2 = (-half_b + sq) / qa

    # Box boundary: slab interval.  Signed-epsilon guard keeps the divide
    # finite (axis-parallel rays get huge-but-finite slab extents) so
    # reverse-mode cotangents stay NaN-free.
    d_safe = jnp.where(jnp.abs(d_b) < 1e-20, jnp.where(d_b < 0, -1e-20, 1e-20), d_b)
    inv_d = 1.0 / d_safe
    tA = (a3[None] - o_b) * inv_d
    tB = (b3[None] - o_b) * inv_d
    b_t1 = jnp.max(jnp.minimum(tA, tB), axis=-1)
    b_t2 = jnp.min(jnp.maximum(tA, tB), axis=-1)
    b_ok = b_t1 < b_t2

    is_sphere = (kind == scene_lib.MED_SPHERE)[None]
    t1 = jnp.where(is_sphere, s_t1, b_t1)
    t2 = jnp.where(is_sphere, s_t2, b_t2)
    ok = jnp.where(is_sphere, s_ok, b_ok)
    # The reference's second probe starts at t1 + 1e-4; a thinner slab than
    # that would fail its second hit.
    ok = ok & (t2 > t1 + MEDIUM_REHIT_EPS)
    return t1, t2, ok


def _medium_t(scene, o, d, u_media, t_min, t_max):
    """Exponential free-flight sample inside boundary (constant_medium.h:49-80).

    u_media: [B, Nm] uniforms in [0,1), one lane per medium per bounce.
    """
    t1, t2, ok = _medium_interval(scene, o, d)
    r1 = jnp.maximum(t1, t_min)
    r2 = jnp.minimum(t2, t_max)
    ok = ok & (r1 < r2)
    r1 = jnp.maximum(r1, 0.0)
    ray_len = vecmath.length(d)[:, None]
    dist_inside = (r2 - r1) * ray_len
    # log(0) = -inf -> hit_dist = +inf -> rejected, matching the reference's
    # behavior when random_double() returns 0.
    hit_dist = scene.med_neg_inv_density[None] * jnp.log(u_media)
    ok = ok & (hit_dist <= dist_inside)
    t = r1 + hit_dist / ray_len
    return t, ok


# --------------------------------------------------------------------------
# Closest hit
# --------------------------------------------------------------------------


def _fold_kind(best, t, valid, kind, base_idx):
    """Merge a [B, N] candidate set into the running (t, kind, idx) best."""
    bt, bk, bi = best
    t = jnp.where(valid, t, BIG)
    i = jnp.argmin(t, axis=-1)
    tm = jnp.take_along_axis(t, i[:, None], axis=-1)[:, 0]
    better = tm < bt
    return (
        jnp.where(better, tm, bt),
        jnp.where(better, kind, bk),
        jnp.where(better, i.astype(jnp.int32) + base_idx, bi),
    )


def _scan_kind(best, n_total, chunk_fn, kind):
    """Fold a whole primitive kind, chunked when large.

    chunk_fn(sl) -> (t [B, n], valid [B, n]) for a python slice sl.
    Chunk boundaries are static so XLA sees fixed shapes.
    """
    for start in range(0, n_total, PRIM_CHUNK):
        sl = slice(start, min(start + PRIM_CHUNK, n_total))
        t, valid = chunk_fn(sl)
        best = _fold_kind(best, t, valid, kind, jnp.int32(start))
    return best


def closest_hit(scene, o, d, time, u_media, t_min):
    """Closest intersection over all primitive kinds.

    Args:
      scene: SceneData.
      o, d: [B,3] ray origin/direction (world).
      time: [B] ray times.
      u_media: [B, Nm] uniforms for media free-flight sampling (ignored when
        the scene has no media).
      t_min: scalar minimum t (shadow-acne epsilon, engine.h:455).

    Returns:
      (t [B], kind [B] int32 with -1 = miss, idx [B] int32 index within kind).
    """
    B = o.shape[0]
    best = (
        jnp.full((B,), BIG, o.dtype),
        jnp.full((B,), -1, jnp.int32),
        jnp.zeros((B,), jnp.int32),
    )
    if scene.n_spheres:
        best = _scan_kind(
            best, scene.n_spheres,
            lambda sl: _sphere_t(scene, sl, o, d, time, t_min, best[0][:, None]),
            scene_lib.PRIM_SPHERE,
        )
    if scene.n_rects:
        best = _scan_kind(
            best, scene.n_rects,
            lambda sl: _rect_t(scene, sl, o, d, t_min, best[0][:, None]),
            scene_lib.PRIM_RECT,
        )
    if scene.n_triangles:
        best = _scan_kind(
            best, scene.n_triangles,
            lambda sl: _triangle_t(scene, sl, o, d, t_min, best[0][:, None]),
            scene_lib.PRIM_TRIANGLE,
        )
    if scene.n_media:
        t, valid = _medium_t(scene, o, d, u_media, t_min, best[0][:, None])
        best = _fold_kind(best, t, valid, scene_lib.PRIM_MEDIUM, jnp.int32(0))
    return best


# --------------------------------------------------------------------------
# Winner hit-record reconstruction
# --------------------------------------------------------------------------


def _xf_point_to_world(rot, trans, p):
    return jnp.einsum("bij,bj->bi", rot, p) + trans


def _xf_vec_to_world(rot, v):
    return jnp.einsum("bij,bj->bi", rot, v)


def _xf_ray_to_object(rot, trans, o, d):
    oc = o - trans
    o_obj = jnp.einsum("bji,bj->bi", rot, oc)
    d_obj = jnp.einsum("bji,bj->bi", rot, d)
    return o_obj, d_obj


def _sphere_record(scene, o, d, time, t, idx):
    ii = jnp.clip(idx, 0, scene.n_spheres - 1)
    c0 = scene.sph_c0[ii]
    c1 = scene.sph_c1[ii]
    t0 = scene.sph_t0[ii]
    t1 = scene.sph_t1[ii]
    r = scene.sph_r[ii]
    has_uv = scene.sph_has_uv[ii]
    rot, trans = _gather_xf(scene, scene.sph_xf[ii])
    o_b, d_b = _xf_ray_to_object(rot, trans, o, d)
    frac = (time - t0) / (t1 - t0)
    center = c0 + frac[:, None] * (c1 - c0)
    p_obj = o_b + t[:, None] * d_b
    # Outward normal in object space; /r handles sign for negative radii.
    n_obj = (p_obj - center) / r[:, None]
    # Spherical UV from the object-space outward normal (sphere.h:24-37).
    # stop_gradient: arccos/arctan2 have infinite local derivatives at the
    # poles, and even a zero cotangent times inf is NaN — UV coordinate
    # gradients for spheres are detached (they only feed nearest-texel
    # image lookups, which are not differentiable in the coordinate anyway).
    n_uv = jax.lax.stop_gradient(n_obj)
    theta = jnp.arccos(jnp.clip(-n_uv[:, 1], -1.0, 1.0))
    phi = jnp.arctan2(-n_uv[:, 2], n_uv[:, 0]) + jnp.pi
    u = (phi / (2.0 * jnp.pi)) * has_uv
    v = (theta / jnp.pi) * has_uv
    n_world = _xf_vec_to_world(rot, n_obj)
    p_world = o + t[:, None] * d
    return p_world, n_world, scene.sph_mat[ii], u, v, u, v


def _rect_record(scene, o, d, t, idx):
    ii = jnp.clip(idx, 0, scene.n_rects - 1)
    axis = scene.rect_axis[ii]
    lo = scene.rect_lo[ii]
    hi = scene.rect_hi[ii]
    rot, trans = _gather_xf(scene, scene.rect_xf[ii])
    o_b, d_b = _xf_ray_to_object(rot, trans, o, d)
    p_obj = o_b + t[:, None] * d_b
    au = jnp.where(axis == 0, 1, 0)
    av = jnp.where(axis == 2, 1, 2)
    pu = jnp.take_along_axis(p_obj, au[:, None], axis=1)[:, 0]
    pv = jnp.take_along_axis(p_obj, av[:, None], axis=1)[:, 0]
    u = (pu - lo[:, 0]) / (hi[:, 0] - lo[:, 0])
    v = (pv - lo[:, 1]) / (hi[:, 1] - lo[:, 1])
    n_obj = jax.nn.one_hot(axis, 3, dtype=o.dtype)
    n_world = _xf_vec_to_world(rot, n_obj)
    p_world = o + t[:, None] * d
    return p_world, n_world, scene.rect_mat[ii], u, v, u, v


def _triangle_record(scene, o, d, t, idx):
    ii = jnp.clip(idx, 0, scene.n_triangles - 1)
    v0 = scene.tri_v0[ii]
    v1 = scene.tri_v1[ii]
    v2 = scene.tri_v2[ii]
    rot, trans = _gather_xf(scene, scene.tri_xf[ii])
    o_b, d_b = _xf_ray_to_object(rot, trans, o, d)
    p_obj = o_b + t[:, None] * d_b
    n = jnp.cross(v1 - v0, v2 - v0)
    n2 = jnp.sum(n * n, axis=-1)
    # Area-ratio barycentrics exactly as triangle.h:62-84: u weights vertex 1,
    # v weights vertex 2, (1-u-v) weights vertex 3.
    u = jnp.sum(n * jnp.cross(v2 - v1, p_obj - v1), -1) / n2
    v = jnp.sum(n * jnp.cross(v0 - v2, p_obj - v2), -1) / n2
    w = 1.0 - u - v
    uv = (
        u[:, None] * scene.tri_uv0[ii]
        + v[:, None] * scene.tri_uv1[ii]
        + w[:, None] * scene.tri_uv2[ii]
    )
    # DIVERGENCE from reference: normalized normal (see module docstring).
    n_world = vecmath.unit(_xf_vec_to_world(rot, n))
    p_world = o + t[:, None] * d
    return p_world, n_world, scene.tri_mat[ii], u, v, uv[:, 0], uv[:, 1]


def _medium_record(scene, o, d, t, idx):
    ii = jnp.clip(idx, 0, scene.n_media - 1)
    p_world = o + t[:, None] * d
    # Arbitrary fixed normal and front_face=true (constant_medium.h:77-78).
    n = jnp.broadcast_to(
        jnp.array([1.0, 0.0, 0.0], o.dtype), p_world.shape
    )
    z = jnp.zeros_like(t)
    return p_world, n, scene.med_mat[ii], z, z, z, z


def make_hit_record(scene, o, d, time, t, kind, idx) -> HitRecord:
    """Reconstruct the full hit record for each ray's winning primitive."""
    B = o.shape[0]
    z3 = jnp.zeros((B, 3), o.dtype)
    z = jnp.zeros((B,), o.dtype)
    p, n, mat, u, v, tu, tv = z3, z3, jnp.zeros((B,), jnp.int32), z, z, z, z

    def merge(cond, new):
        nonlocal p, n, mat, u, v, tu, tv
        np_, nn, nm, nu, nv, ntu, ntv = new
        c1 = cond[:, None]
        p = jnp.where(c1, np_, p)
        n = jnp.where(c1, nn, n)
        mat = jnp.where(cond, nm, mat)
        u = jnp.where(cond, nu, u)
        v = jnp.where(cond, nv, v)
        tu = jnp.where(cond, ntu, tu)
        tv = jnp.where(cond, ntv, tv)

    if scene.n_spheres:
        merge(kind == scene_lib.PRIM_SPHERE, _sphere_record(scene, o, d, time, t, idx))
    if scene.n_rects:
        merge(kind == scene_lib.PRIM_RECT, _rect_record(scene, o, d, t, idx))
    if scene.n_triangles:
        merge(kind == scene_lib.PRIM_TRIANGLE, _triangle_record(scene, o, d, t, idx))
    if scene.n_media:
        merge(kind == scene_lib.PRIM_MEDIUM, _medium_record(scene, o, d, t, idx))

    is_medium = kind == scene_lib.PRIM_MEDIUM
    # set_face_normal (hittable.h:18-22); media force front=true with the
    # arbitrary (1,0,0) normal.
    front = (vecmath.dot(d, n) < 0.0) | is_medium
    n = jnp.where((front | is_medium)[:, None], n, -n)
    return HitRecord(t=t, p=p, normal=n, front_face=front, mat=mat, u=u, v=v, tu=tu, tv=tv)
