"""Pallas TPU megakernel: the ENTIRE forward wavefront in one kernel.

The XLA forward path (ops/integrator.trace_regenerative) runs the bounce
body as ~hundreds of separate fusions per iteration with every piece of ray
state round-tripping through HBM between them, and its while_loop trip
count is max-over-ALL-lanes total segments.  scripts/roofline.py measured
the resulting step at ~4% of the cost-model floor and attributed the gap to
exactly that structure ("fewer/larger fusions per bounce" — CLAUDE.md).

This kernel is the structural fix for sweep-regime scenes: each grid
program owns a block of rays resident in VMEM and runs the WHOLE
regenerating path-trace loop to completion on-chip —

  * camera ray generation (engine.h:58-68 + camera.h:38-47),
  * counter-based threefry draws (ops/rng.py — the same code, called
    inside the kernel on uint32 lanes),
  * the closest-hit sweep over all primitives (spheres first, then rects,
    matching ops/intersect.closest_hit's fold order),
  * branchless material shading + scatter (material.h contracts, mirroring
    ops/shade.emit_and_scatter),
  * per-lane sample regeneration (ops/integrator._regen_loop_parts.body).

State NEVER touches HBM until the block's lanes exhaust their samples, and
the while_loop trip count is max-over-1024-lanes — strictly tighter than
the global wavefront's max-over-90k.

Geometry is pre-baked into world space per primitive row so the kernel does
no per-ray transform work:

  * spheres: world centers (a rigid transform maps a sphere to a sphere and
    commutes with the center lerp — same packing as bvh_kernel.pack_spheres);
  * rects: world parallelograms (q0 corner, edge vectors eu/ev, unit normal
    n, plane offset d0 = n.q0): t = (d0 - n.o)/(n.d), then
    0 <= (p-q0).eu <= |eu|^2 (and v alike) reproduces aarect.cpp's
    inclusive bound check; for identity transforms the arithmetic reduces
    exactly to the axis-aligned sweep's (0*x terms vanish exactly in f32).

Applicability (static, ``supports()``): sweep-only scenes (no BVH, no
media, no triangles), materials within {lambertian, metal, dielectric,
diffuse_light}, textures within {solid, checker}.  That covers the Cornell
box, sphere-ground and two-spheres benches; BVH'd scenes keep the packet
kernel, textured/mesh scenes keep the XLA wavefront.

Numerics: the same f32 formulas as the XLA path, but Mosaic's
transcendental lowerings (sin/cos/sqrt/cbrt) and fma contraction differ at
ulp level, so images agree to tolerance rather than bit-exactly (validated
on-chip: scripts/ab_mega.py) — same contract as the packet BVH kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from another_raytracer_tpu.models import scene as scene_lib
from another_raytracer_tpu.ops import rng
from another_raytracer_tpu.ops.vec3 import V3

BIG = 3e37
# In-process block sweep (2026-08-21, pipelined 8-call walls): cornell fwd
# 7.9/6.9/6.8/7.0 ms and sphere_ground 6.3/5.5/5.3/5.4 ms at block
# 1024/2048/4096/8192 — 4096 amortizes scalar row reads + per-iteration
# loop overhead without losing max-over-block tightness.
DEFAULT_BLOCK = 4096
NEAR_ZERO_EPS = 1e-8  # vec3.h:51

# Columns per primitive row (flattened [N * ROW_W] f32, scalar-prefetched).
ROW_W = 32
# Shared material slots (identical for both primitive kinds).
_C_MKIND, _C_FUZZ, _C_IR, _C_TKIND = 16, 17, 18, 19
_C_CA, _C_CB = 20, 23
_C_TID = 26  # texture id (exact in f32) — folded only when recording codes

# Module A/B knob: None = auto (TPU and supports(scene, cam)); True forces
# (errors if unsupported); False disables.  Trace-time flag — flip only with
# render.clear_trace_caches() (CLAUDE.md rule 11).
MEGA_FORWARD = None


def _shading_ok(scene) -> bool:
    return (
        scene.n_media == 0
        and scene.n_triangles == 0
        and set(scene.mat_kinds) <= {
            scene_lib.MAT_LAMBERTIAN, scene_lib.MAT_METAL,
            scene_lib.MAT_DIELECTRIC, scene_lib.MAT_DIFFUSE_LIGHT}
        and set(scene.tex_kinds) <= {scene_lib.TEX_SOLID,
                                     scene_lib.TEX_CHECKER}
    )


def supports(scene, cam) -> bool:
    """Static applicability check, sweep mode (all fields non-pytree)."""
    return (
        not scene.has_accel
        and 0 < (scene.n_spheres + scene.n_rects) <= 64
        and _shading_ok(scene)
    )


# VMEM budget for the accel-mode sphere tree (rows pad 32->128 lanes).
ACCEL_MAX_ROWS = 8192


def supports_accel(scene, cam) -> bool:
    """Static applicability, BVH mode: a single sphere tree traversed
    in-kernel (packet DFS, materials folded during leaf tests).

    Validated on-chip (scripts/ab_mega.py random: 99.44% pixels within
    2/255, 0.012% segment drift) but measured NEUTRAL on the random bench
    at the tuned block 8192 (80.7 vs 84.8 ms; 1.9x WORSE at block 1024 —
    a block's traversal union saturates the 970-sphere tree, so the fused
    shading savings are offset by per-leaf material folds).  Auto-enable
    therefore covers sweep scenes only; force with MEGA_FORWARD = True."""
    return (
        scene.sph_in_bvh
        and scene.n_sph_bvh_nodes > 0
        and scene.n_bvh_nodes == 0
        and scene.n_rect_bvh_nodes == 0
        and scene.n_rects == 0
        and scene.sph_bvh_rows.shape[0] <= ACCEL_MAX_ROWS
        and _shading_ok(scene)
    )


def enabled(scene, cam) -> bool:
    if MEGA_FORWARD is False:
        return False
    if MEGA_FORWARD is True:
        if not (supports(scene, cam) or supports_accel(scene, cam)):
            raise ValueError("MEGA_FORWARD forced on but scene unsupported")
        return True
    # Auto: sweep scenes only (accel mode measured neutral on its bench —
    # see supports_accel).
    return supports(scene, cam) and jax.default_backend() not in ("cpu",)


# --------------------------------------------------------------------------
# Row packing (traced jnp — scene arrays may be tracers under jit)
# --------------------------------------------------------------------------


def _onehot3(axis):
    """[N] int axis -> [N,3] f32 one-hot (exact 0/1)."""
    return (axis[:, None] == jnp.arange(3, dtype=axis.dtype)[None, :]).astype(
        jnp.float32)


def _mat_cols(scene, mat_ids):
    """Per-primitive baked material/texture scalars -> [N, 16] (cols 16..31)."""
    mk = scene.mat_kind[mat_ids].astype(jnp.float32)
    fuzz = scene.mat_fuzz[mat_ids]
    ir = scene.mat_ir[mat_ids]
    tex = scene.mat_tex[mat_ids]
    tk = scene.tex_kind[tex].astype(jnp.float32)
    ca = scene.tex_ca[tex]
    cb = scene.tex_cb[tex]
    tid = tex.astype(jnp.float32)
    pad = jnp.zeros((mat_ids.shape[0], ROW_W - _C_TID - 1), jnp.float32)
    return jnp.concatenate(
        [mk[:, None], fuzz[:, None], ir[:, None], tk[:, None], ca, cb,
         tid[:, None], pad],
        axis=1)


def pack_rows(scene):
    """[ (Ns+Nr) * ROW_W ] flat f32 row table; spheres first, then rects —
    the fold order of ops/intersect.closest_hit (strict improvement keeps
    the earlier row on ties, like argmin's first-min-index)."""
    parts = []
    if scene.n_spheres:
        rot = scene.xf_rot[scene.sph_xf]
        tr = scene.xf_trans[scene.sph_xf]
        c0w = jnp.einsum("nij,nj->ni", rot, scene.sph_c0) + tr
        c1w = jnp.einsum("nij,nj->ni", rot, scene.sph_c1) + tr
        dt = scene.sph_t1 - scene.sph_t0
        inv_dt = jnp.where(dt != 0.0, 1.0 / jnp.where(dt != 0.0, dt, 1.0), 0.0)
        pad1 = jnp.zeros((scene.n_spheres, 1), jnp.float32)
        geom = jnp.concatenate(
            [pad1, c0w, c1w - c0w, scene.sph_t0[:, None], inv_dt[:, None],
             scene.sph_r[:, None],
             jnp.zeros((scene.n_spheres, _C_MKIND - 10), jnp.float32)], axis=1)
        parts.append(jnp.concatenate(
            [geom, _mat_cols(scene, scene.sph_mat)], axis=1))
    if scene.n_rects:
        axis = scene.rect_axis
        au = jnp.where(axis == 0, 1, 0)
        av = jnp.where(axis == 2, 1, 2)
        lo, hi = scene.rect_lo, scene.rect_hi
        q0_obj = (_onehot3(axis) * scene.rect_k[:, None]
                  + _onehot3(au) * lo[:, 0:1] + _onehot3(av) * lo[:, 1:2])
        eu_obj = _onehot3(au) * (hi[:, 0:1] - lo[:, 0:1])
        ev_obj = _onehot3(av) * (hi[:, 1:2] - lo[:, 1:2])
        n_obj = _onehot3(axis)
        rot = scene.xf_rot[scene.rect_xf]
        tr = scene.xf_trans[scene.rect_xf]
        mm = lambda v: jnp.einsum("nij,nj->ni", rot, v)  # noqa: E731
        q0 = mm(q0_obj) + tr
        eu = mm(eu_obj)
        ev = mm(ev_obj)
        nw = mm(n_obj)
        d0 = jnp.sum(nw * q0, axis=1, keepdims=True)
        # Exact object-space edge lengths squared (rotation-free, so the
        # identity-transform case reproduces the sweep's bound arithmetic).
        l2u = ((hi[:, 0] - lo[:, 0]) ** 2)[:, None]
        l2v = ((hi[:, 1] - lo[:, 1]) ** 2)[:, None]
        pad1 = jnp.zeros((scene.n_rects, 1), jnp.float32)
        geom = jnp.concatenate([pad1, q0, eu, ev, nw, d0, l2u, l2v], axis=1)
        parts.append(jnp.concatenate(
            [geom, _mat_cols(scene, scene.rect_mat)], axis=1))
    return jnp.concatenate(parts, axis=0).reshape(-1)


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------


def _kernel(*args,
            n_spheres, n_rects, mat_kinds, tex_kinds, has_lens, has_time,
            max_depth, t_min, width, height, max_iters=0, n_textures=0,
            accel=False, leaf_size=0, n_nodes=0):
    if accel:
        # BVH mode: node columns via scalar prefetch, leaf rows in VMEM
        # (dynamic per-row scalar reads, bvh_kernel pattern), plus fold
        # scratch for the traversal's best-hit state.
        (uic, camc, lox_r, loy_r, loz_r, hix_r, hiy_r, hiz_r, esc_r, meta_r,
         rows_ref, pix_ref, fi_ref, fj_ref, samp_ref,
         out_tx, out_ty, out_tz, out_seg, *refs) = args
    else:
        (uic, rows_sm, camc, pix_ref, fi_ref, fj_ref, samp_ref,
         out_tx, out_ty, out_tz, out_seg, *refs) = args
    # Optional residual-recording outputs (the differentiable fused path,
    # ops/pallas/mega_diff.py): per while iteration, one int32 code row —
    # code = tex_id*16 + checker_odd*8 + chain_end*4 + event with event
    # 0=dead, 1=scatter, 2=light-hit, 3=miss — and the three channels of the
    # iteration-ENTRY throughput (T_prev: the replay backward needs it and
    # the kernel already holds it in VMEM, so writing it here saves the
    # bwd an entire forward-replay scan + its [iters,B] stacking DUSes).
    # Enabled when max_iters > 0.  NOTE the pallas arg order: outputs
    # (incl. residual outputs) precede scratch, so these unpack BEFORE
    # the accel fold scratch.
    if max_iters:
        out_code, out_tpx, out_tpy, out_tpz, *refs = refs
    if accel:
        (bt_s, bnx_s, bny_s, bnz_s, bmk_s, bca0_s, bca1_s, bca2_s,
         bcb0_s, bcb1_s, bcb2_s, btk_s, bfz_s, bir_s, *refs) = refs
        if max_iters:
            btid_s, *refs = refs
    (ox_s, oy_s, oz_s, dx_s, dy_s, dz_s, tm_s,
     tpx_s, tpy_s, tpz_s, prx_s, pry_s, prz_s,
     samp_s, bounce_s, alive_s) = refs
    # np scalars, NOT jnp: jnp constants built outside the traced body would
    # be captured-constant arrays, which pallas_call rejects.
    f32 = np.float32
    u32 = np.uint32
    N = n_spheres + n_rects

    # ---- hoisted scalars (loop-invariant; live in sregs/SMEM) ------------
    def c3(base):
        return (camc[base], camc[base + 1], camc[base + 2])

    cam_o = c3(0)
    cam_base = c3(3)
    cam_h = c3(6)
    cam_v = c3(9)
    cam_u = c3(12)
    cam_w = c3(15)
    lens_radius = camc[18]
    time0 = camc[19]
    time_del = camc[20]
    bg = c3(21)

    seed = uic[0]
    limit = uic[1]
    stride = uic[2]

    if not accel:
        rows = [[rows_sm[j * ROW_W + c] for c in range(ROW_W)]
                for j in range(N)]

    pix = pix_ref[:]
    fi = fi_ref[:]
    fj = fj_ref[:]

    inv_w1 = f32(1.0 / (width - 1))
    inv_h1 = f32(1.0 / (height - 1))
    h1 = f32(height - 1)
    two_pi = f32(6.2831853071795864769)

    has_metal = scene_lib.MAT_METAL in mat_kinds
    has_diel = scene_lib.MAT_DIELECTRIC in mat_kinds
    has_light = scene_lib.MAT_DIFFUSE_LIGHT in mat_kinds
    has_checker = scene_lib.TEX_CHECKER in tex_kinds
    need_sphere_draw = has_metal  # isotropic excluded by supports()
    need_unit_d = has_metal or has_diel
    need_b_draw = need_sphere_draw or has_diel

    def uniform2(sample, bounce, dim):
        """ops/rng.uniform2 inline: key (seed, bounce<<8|dim), ctr (pix, s)."""
        k1 = (bounce << u32(8)) | u32(dim)
        b0, b1 = rng.threefry2x32(seed, k1, pix, sample, rounds=rng.ROUNDS)
        return rng._uniform_from_bits(b0), rng._uniform_from_bits(b1)

    def cam_rays(sample):
        """camera.generate_rays inline (engine.h:58-68, camera.h:38-47)."""
        cb = u32(rng.CAMERA_BOUNCE)
        ju, jv = uniform2(sample, cb, rng.DIM_PIXEL_JITTER)
        s = (fi + ju) * inv_w1
        t = (h1 - fj + jv) * inv_h1
        if has_lens:
            lu, lv = uniform2(sample, cb, rng.DIM_LENS)
            rr = jnp.sqrt(lu)
            phi = two_pi * lv
            rdx = lens_radius * (rr * jnp.cos(phi))
            rdy = lens_radius * (rr * jnp.sin(phi))
            offs = tuple(cam_u[c] * rdx + cam_w[c] * rdy for c in range(3))
            o = tuple(offs[c] + cam_o[c] for c in range(3))
            d = tuple(cam_base[c] + cam_h[c] * s + cam_v[c] * t - offs[c]
                      for c in range(3))
        else:
            o = tuple(cam_o[c] + s * 0.0 for c in range(3))
            d = tuple(cam_base[c] + cam_h[c] * s + cam_v[c] * t
                      for c in range(3))
        if has_time:
            tu, _ = uniform2(sample, cb, rng.DIM_TIME)
            tmv = time0 + tu * time_del
        else:
            tmv = time0 + s * 0.0
        return o, d, tmv

    # ---- init ------------------------------------------------------------
    sample0 = samp_ref[:]
    o0, d0, tm0 = cam_rays(sample0)
    z = o0[0] * 0.0
    alive0 = sample0 < limit

    ox_s[:], oy_s[:], oz_s[:] = o0
    dx_s[:], dy_s[:], dz_s[:] = d0
    tm_s[:] = tm0
    tpx_s[:] = z + 1.0
    tpy_s[:] = z + 1.0
    tpz_s[:] = z + 1.0
    prx_s[:] = z
    pry_s[:] = z
    prz_s[:] = z
    samp_s[:] = sample0
    bounce_s[:] = jnp.zeros_like(sample0)
    alive_s[:] = alive0.astype(jnp.int32)
    out_tx[:] = z
    out_ty[:] = z
    out_tz[:] = z
    out_seg[:] = alive0.astype(jnp.int32)
    if max_iters:
        out_code[:] = jnp.zeros_like(out_code[:])
        out_tpx[:] = jnp.zeros_like(out_tpx[:])
        out_tpy[:] = jnp.zeros_like(out_tpy[:])
        out_tpz[:] = jnp.zeros_like(out_tpz[:])

    def body(carry):
        _count, it = carry
        o = (ox_s[:], oy_s[:], oz_s[:])
        d = (dx_s[:], dy_s[:], dz_s[:])
        tmv = tm_s[:]
        tp = tp_entry = (tpx_s[:], tpy_s[:], tpz_s[:])
        path = (prx_s[:], pry_s[:], prz_s[:])
        sample = samp_s[:]
        bounce = bounce_s[:]
        alive = alive_s[:] > 0

        a_len = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        if accel:
            # ---- packet DFS over the sphere tree (bvh_kernel pattern):
            # ONE scalar cursor per block, vector slab/leaf tests; the
            # best-hit + material fold state lives in scratch refs.
            # Dead lanes are parked far outside every scene's bounds with
            # zeroed directions so slab tests reject them in one compare
            # (integrator._park_dead semantics).
            ot = tuple(jnp.where(alive, o[c], 1e8) for c in range(3))
            dt_ = tuple(jnp.where(alive, d[c], 0.0) for c in range(3))

            def safe_inv(c):
                return 1.0 / jnp.where(jnp.abs(c) < 1e-20,
                                       jnp.where(c < 0, -1e-20, 1e-20), c)

            inv = (safe_inv(dt_[0]), safe_inv(dt_[1]), safe_inv(dt_[2]))
            a_trav = dt_[0] * dt_[0] + dt_[1] * dt_[1] + dt_[2] * dt_[2]
            inv_a = 1.0 / jnp.where(a_trav > 0.0, a_trav, 1.0)
            los = (lox_r, loy_r, loz_r)
            his = (hix_r, hiy_r, hiz_r)

            bt_s[:] = z + BIG
            bnx_s[:] = z
            bny_s[:] = z
            bnz_s[:] = z
            bmk_s[:] = z
            bca0_s[:] = z
            bca1_s[:] = z
            bca2_s[:] = z
            if has_checker:
                bcb0_s[:] = z
                bcb1_s[:] = z
                bcb2_s[:] = z
                btk_s[:] = z
            if has_metal:
                bfz_s[:] = z
            if has_diel:
                bir_s[:] = z
            if max_iters:
                btid_s[:] = z

            def slab(j, bt):
                tn = jnp.full_like(bt, t_min)
                tf = bt
                for c in range(3):
                    lo = los[c][j]
                    hi = his[c][j]
                    ta = (lo - ot[c]) * inv[c]
                    tb = (hi - ot[c]) * inv[c]
                    tn = jnp.maximum(tn, jnp.minimum(ta, tb))
                    tf = jnp.minimum(tf, jnp.maximum(ta, tb))
                return tn < tf

            def tbody(j):
                bt = bt_s[:]
                hit_box = slab(j, bt)
                any_hit = jnp.any(hit_box)
                meta = meta_r[j]
                count = jax.lax.rem(meta, 64)
                first = jax.lax.div(meta, 64)
                esc = esc_r[j]

                @pl.when(any_hit & (count > 0))
                def _():
                    bt2 = bt_s[:]
                    for k in range(leaf_size):
                        row = first + k
                        # sphere leaf test (bvh_kernel.sphere_test cols)
                        frac = (tmv - rows_ref[row, 6]) * rows_ref[row, 7]
                        cx = rows_ref[row, 0] + frac * rows_ref[row, 3]
                        cy = rows_ref[row, 1] + frac * rows_ref[row, 4]
                        cz = rows_ref[row, 2] + frac * rows_ref[row, 5]
                        rr_ = rows_ref[row, 8]
                        ocx = ot[0] - cx
                        ocy = ot[1] - cy
                        ocz = ot[2] - cz
                        half_b = (ocx * dt_[0] + ocy * dt_[1] + ocz * dt_[2])
                        cc = ocx * ocx + ocy * ocy + ocz * ocz - rr_ * rr_
                        disc = half_b * half_b - a_trav * cc
                        okk = disc > 0.0
                        sq = jnp.sqrt(jnp.where(okk, disc, 0.0))
                        root1 = (-half_b - sq) * inv_a
                        r1ok = (root1 > t_min) & (root1 < bt2)
                        t = jnp.where(r1ok, root1, (-half_b + sq) * inv_a)
                        valid = (okk & (t > t_min) & (t < bt2)
                                 & (k < count) & hit_box)
                        inv_r = 1.0 / jnp.where(rr_ != 0.0, rr_, 1.0)
                        nx = (ot[0] + t * dt_[0] - cx) * inv_r
                        ny = (ot[1] + t * dt_[1] - cy) * inv_r
                        nz = (ot[2] + t * dt_[2] - cz) * inv_r
                        bt2 = jnp.where(valid, t, bt2)
                        bnx_s[:] = jnp.where(valid, nx, bnx_s[:])
                        bny_s[:] = jnp.where(valid, ny, bny_s[:])
                        bnz_s[:] = jnp.where(valid, nz, bnz_s[:])
                        bmk_s[:] = jnp.where(valid, rows_ref[row, _C_MKIND],
                                             bmk_s[:])
                        bca0_s[:] = jnp.where(valid, rows_ref[row, _C_CA],
                                              bca0_s[:])
                        bca1_s[:] = jnp.where(valid, rows_ref[row, _C_CA + 1],
                                              bca1_s[:])
                        bca2_s[:] = jnp.where(valid, rows_ref[row, _C_CA + 2],
                                              bca2_s[:])
                        if has_checker:
                            bcb0_s[:] = jnp.where(
                                valid, rows_ref[row, _C_CB], bcb0_s[:])
                            bcb1_s[:] = jnp.where(
                                valid, rows_ref[row, _C_CB + 1], bcb1_s[:])
                            bcb2_s[:] = jnp.where(
                                valid, rows_ref[row, _C_CB + 2], bcb2_s[:])
                            btk_s[:] = jnp.where(
                                valid, rows_ref[row, _C_TKIND], btk_s[:])
                        if has_metal:
                            bfz_s[:] = jnp.where(
                                valid, rows_ref[row, _C_FUZZ], bfz_s[:])
                        if has_diel:
                            bir_s[:] = jnp.where(
                                valid, rows_ref[row, _C_IR], bir_s[:])
                        if max_iters:
                            btid_s[:] = jnp.where(
                                valid, rows_ref[row, _C_TID], btid_s[:])
                    bt_s[:] = bt2

                return jnp.where(any_hit, j + 1, esc)

            jax.lax.while_loop(lambda j: j < n_nodes, tbody, jnp.int32(0))

            best_t = bt_s[:]
            b_n = (bnx_s[:], bny_s[:], bnz_s[:])
            b_mk = bmk_s[:]
            b_ca = (bca0_s[:], bca1_s[:], bca2_s[:])
            b_cb = ((bcb0_s[:], bcb1_s[:], bcb2_s[:])
                    if has_checker else None)
            b_tk = btk_s[:] if has_checker else None
            b_fuzz = bfz_s[:] if has_metal else None
            b_ir = bir_s[:] if has_diel else None
            b_tid = btid_s[:] if max_iters else None

        # ---- closest-hit sweep (intersect.closest_hit order) -------------
        if not accel:
            best_t = z + BIG
            b_n = (z, z, z)
            b_mk = z
            b_ca = (z, z, z)
            b_cb = (z, z, z) if has_checker else None
            b_tk = z if has_checker else None
            b_fuzz = z if has_metal else None
            b_ir = z if has_diel else None
            b_tid = z if max_iters else None

        def fold(valid, t, n, r):
            nonlocal best_t, b_n, b_mk, b_ca, b_cb, b_tk, b_fuzz, b_ir, b_tid
            best_t = jnp.where(valid, t, best_t)
            if max_iters:
                b_tid = jnp.where(valid, r[_C_TID], b_tid)
            b_n = tuple(jnp.where(valid, n[c], b_n[c]) for c in range(3))
            b_mk = jnp.where(valid, r[_C_MKIND], b_mk)
            b_ca = tuple(jnp.where(valid, r[_C_CA + c], b_ca[c])
                         for c in range(3))
            if has_checker:
                b_cb = tuple(jnp.where(valid, r[_C_CB + c], b_cb[c])
                             for c in range(3))
                b_tk = jnp.where(valid, r[_C_TKIND], b_tk)
            if has_metal:
                b_fuzz = jnp.where(valid, r[_C_FUZZ], b_fuzz)
            if has_diel:
                b_ir = jnp.where(valid, r[_C_IR], b_ir)

        n_sweep_sph = 0 if accel else n_spheres
        n_sweep = 0 if accel else N
        if n_sweep_sph:
            inv_a = 1.0 / jnp.where(a_len > 0.0, a_len, 1.0)
        for j in range(n_sweep_sph):
            r = rows[j]
            # sphere.h:39-65 / moving_sphere.h:29-31 on world-baked centers.
            frac = (tmv - r[7]) * r[8]
            cx = r[1] + frac * r[4]
            cy = r[2] + frac * r[5]
            cz = r[3] + frac * r[6]
            ocx = o[0] - cx
            ocy = o[1] - cy
            ocz = o[2] - cz
            half_b = ocx * d[0] + ocy * d[1] + ocz * d[2]
            c = ocx * ocx + ocy * ocy + ocz * ocz - r[9] * r[9]
            disc = half_b * half_b - a_len * c
            ok = disc > 0.0
            sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
            root1 = (-half_b - sq) * inv_a
            r1_ok = (root1 > t_min) & (root1 < best_t)
            t = jnp.where(r1_ok, root1, (-half_b + sq) * inv_a)
            valid = ok & (t > t_min) & (t < best_t)
            inv_r = 1.0 / r[9]
            px = o[0] + t * d[0]
            py = o[1] + t * d[1]
            pz = o[2] + t * d[2]
            n = ((px - cx) * inv_r, (py - cy) * inv_r, (pz - cz) * inv_r)
            fold(valid, t, n, r)
        for j in range(n_sweep_sph, n_sweep):
            r = rows[j]
            # World parallelogram == aarect.cpp plane + inclusive bounds.
            n = (r[10], r[11], r[12])
            ndotd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
            ndoto = n[0] * o[0] + n[1] * o[1] + n[2] * o[2]
            ok = ndotd != 0.0
            t = jnp.where(ok, (r[13] - ndoto) / jnp.where(ok, ndotd, 1.0), BIG)
            rx = o[0] + t * d[0] - r[1]
            ry = o[1] + t * d[1] - r[2]
            rz = o[2] + t * d[2] - r[3]
            a = rx * r[4] + ry * r[5] + rz * r[6]
            b = rx * r[7] + ry * r[8] + rz * r[9]
            inside = (a >= 0.0) & (a <= r[14]) & (b >= 0.0) & (b <= r[15])
            valid = ok & inside & (t > t_min) & (t < best_t)
            fold(valid, t, n, r)

        hit = alive & (best_t < BIG)
        miss_now = alive & ~hit

        # ---- shade + scatter (shade.emit_and_scatter) ---------------------
        # set_face_normal (hittable.h:18-22)
        ndd = b_n[0] * d[0] + b_n[1] * d[1] + b_n[2] * d[2]
        front = ndd < 0.0
        n = tuple(jnp.where(front, b_n[c], -b_n[c]) for c in range(3))
        p = tuple(o[c] + best_t * d[c] for c in range(3))

        # texture value (texture.h:39-45 checker / solid)
        alb = b_ca
        if has_checker:
            sines = (jnp.sin(10.0 * p[0]) * jnp.sin(10.0 * p[1])
                     * jnp.sin(10.0 * p[2]))
            is_check = (b_tk == f32(scene_lib.TEX_CHECKER)) & (sines < 0.0)
            alb = tuple(jnp.where(is_check, b_cb[c], alb[c]) for c in range(3))

        u1, u2 = uniform2(sample, bounce, rng.DIM_SCATTER_A)
        zz = 1.0 - 2.0 * u1
        rr = jnp.sqrt(jnp.maximum(0.0, 1.0 - zz * zz))
        phi = two_pi * u2
        rand_unit = (rr * jnp.cos(phi), rr * jnp.sin(phi), zz)
        if need_b_draw:
            u3, u4 = uniform2(sample, bounce, rng.DIM_SCATTER_B)
        if need_sphere_draw:
            # cbrt has no Mosaic lowering; exp(log(u)/3) is ulp-equivalent
            # on (0,1) and the where handles u == 0 exactly.
            cr = jnp.where(
                u3 > 0.0,
                jnp.exp(jnp.log(jnp.maximum(u3, f32(1e-38))) * f32(1 / 3)),
                0.0)
            rand_sph = tuple(rand_unit[c] * cr for c in range(3))
        if need_unit_d:
            inv_len = jax.lax.rsqrt(jnp.where(a_len > 0.0, a_len, 1.0))
            unit_d = tuple(d[c] * inv_len for c in range(3))

        # lambertian (material.h:29-36)
        lam = tuple(n[c] + rand_unit[c] for c in range(3))
        lam_nz = ((jnp.abs(lam[0]) < NEAR_ZERO_EPS)
                  & (jnp.abs(lam[1]) < NEAR_ZERO_EPS)
                  & (jnp.abs(lam[2]) < NEAR_ZERO_EPS))
        new_d = tuple(jnp.where(lam_nz, n[c], lam[c]) for c in range(3))
        ok = hit

        if has_metal:
            is_met = b_mk == f32(scene_lib.MAT_METAL)
            uddn = (unit_d[0] * n[0] + unit_d[1] * n[1] + unit_d[2] * n[2])
            met = tuple(unit_d[c] - n[c] * (2.0 * uddn)
                        + rand_sph[c] * b_fuzz for c in range(3))
            met_ok = met[0] * n[0] + met[1] * n[1] + met[2] * n[2] > 0.0
            new_d = tuple(jnp.where(is_met, met[c], new_d[c]) for c in range(3))
            # boolean algebra, not where() on bool vectors (i8->i1 trunc
            # has no Mosaic lowering)
            ok = (ok & ~is_met) | (is_met & hit & met_ok)

        if has_diel:
            is_die = b_mk == f32(scene_lib.MAT_DIELECTRIC)
            ratio = jnp.where(front, 1.0 / b_ir, b_ir)
            uddn = (unit_d[0] * n[0] + unit_d[1] * n[1] + unit_d[2] * n[2])
            cos_t = jnp.minimum(-uddn, 1.0)
            sin_t = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_t * cos_t))
            cannot = ratio * sin_t > 1.0
            r0 = (1.0 - ratio) / (1.0 + ratio)
            r0 = r0 * r0
            refl = r0 + (1.0 - r0) * (1.0 - cos_t) ** 5
            rfl = tuple(unit_d[c] - n[c] * (2.0 * uddn) for c in range(3))
            # vec3.refract with the same 1e-12 TIR floor
            perp = tuple((unit_d[c] + n[c] * cos_t) * ratio for c in range(3))
            p2 = perp[0] ** 2 + perp[1] ** 2 + perp[2] ** 2
            par = -jnp.sqrt(jnp.maximum(jnp.abs(1.0 - p2), 1e-12))
            rfr = tuple(perp[c] + n[c] * par for c in range(3))
            die_refl = cannot | (refl > u4)
            die = tuple(jnp.where(die_refl, rfl[c], rfr[c]) for c in range(3))
            new_d = tuple(jnp.where(is_die, die[c], new_d[c]) for c in range(3))

        att = alb
        if has_diel:
            att = tuple(jnp.where(is_die, 1.0, att[c]) for c in range(3))
        if has_light:
            is_light = b_mk == f32(scene_lib.MAT_DIFFUSE_LIGHT)
            # boolean algebra, not where(mask, False, ok): the scalar False
            # literal lowers through an i8->i1 trunc Mosaic lacks.
            ok = ok & ~is_light
            emit = tuple(jnp.where(is_light, alb[c], 0.0) for c in range(3))

        # ---- radiance / carry updates (integrator._advance + regen body) --
        delta = [jnp.where(miss_now, tp[c] * bg[c], 0.0) for c in range(3)]
        if has_light:
            for c in range(3):
                delta[c] = delta[c] + jnp.where(hit, tp[c] * emit[c], 0.0)
        scattered = hit & ok
        path = tuple(path[c] + delta[c] for c in range(3))
        tp = tuple(jnp.where(scattered, tp[c] * att[c], tp[c])
                   for c in range(3))
        o = tuple(jnp.where(scattered, p[c], o[c]) for c in range(3))
        d = tuple(jnp.where(scattered, new_d[c], d[c]) for c in range(3))
        bounce = jnp.where(alive, bounce + u32(1), bounce)
        alive_next = scattered & (bounce < u32(max_depth))
        seg = out_seg[:] + scattered.astype(jnp.int32)

        ended = alive & ~alive_next
        if max_iters:
            # Residual code row for the fused differentiable path:
            # tid*16 + checker_odd*8 + chain_end*4 + event.
            ev = scattered.astype(jnp.int32) + jnp.where(miss_now, 3, 0)
            if has_light:
                ev = ev + jnp.where(hit & is_light, 2, 0)
            tid = b_tid.astype(jnp.int32)
            if has_diel:
                # Dielectric attenuation is the constant (1,1,1)
                # (material.h:77-79): record the sentinel tid n_textures so
                # the replay multiplies by 1 and routes no albedo cotangent.
                tid = jnp.where(is_die, n_textures, tid)
            tid16 = jnp.where(ev > 0, tid * 16, 0)
            code = tid16 + jnp.where(ended, 4, 0) + ev
            if has_checker:
                # which checker branch won: the replay routes the albedo
                # cotangent to tex_cb for odd cells
                code = code + jnp.where(is_check, 8, 0)
            # Metal absorption (scatter below the surface, material.h:52-55)
            # emits ev=0 WITH the end bit: the replay zeroes the suffix
            # value there (the chain dies contributing nothing).

            blk = out_code.shape[0] // max_iters

            @pl.when(it < max_iters)
            def _():
                # multiple_of: Mosaic must prove T(1024) tile alignment of
                # the dynamic row offset (blk is a multiple of 1024).
                row = pl.ds(pl.multiple_of(it * blk, 1024), blk)
                out_code[row] = code
                out_tpx[row] = tp_entry[0]
                out_tpy[row] = tp_entry[1]
                out_tpz[row] = tp_entry[2]
        out_tx[:] = out_tx[:] + jnp.where(ended, path[0], 0.0)
        out_ty[:] = out_ty[:] + jnp.where(ended, path[1], 0.0)
        out_tz[:] = out_tz[:] + jnp.where(ended, path[2], 0.0)
        path = tuple(jnp.where(ended, 0.0, path[c]) for c in range(3))

        next_sample = jnp.where(ended, sample + stride, sample)
        regen = ended & (next_sample < limit)
        o2, d2, tm2 = cam_rays(next_sample)
        o = tuple(jnp.where(regen, o2[c], o[c]) for c in range(3))
        d = tuple(jnp.where(regen, d2[c], d[c]) for c in range(3))
        tmv = jnp.where(regen, tm2, tmv)
        tp = tuple(jnp.where(regen, 1.0, tp[c]) for c in range(3))
        bounce = jnp.where(regen, u32(0), bounce)
        alive_next = alive_next | regen
        out_seg[:] = seg + regen.astype(jnp.int32)

        ox_s[:], oy_s[:], oz_s[:] = o
        dx_s[:], dy_s[:], dz_s[:] = d
        tm_s[:] = tmv
        tpx_s[:], tpy_s[:], tpz_s[:] = tp
        prx_s[:], pry_s[:], prz_s[:] = path
        samp_s[:] = next_sample
        bounce_s[:] = bounce
        alive_s[:] = alive_next.astype(jnp.int32)
        return jnp.sum(alive_next.astype(jnp.int32)), it + 1

    jax.lax.while_loop(lambda c: c[0] > 0, body,
                       (jnp.sum(alive0.astype(jnp.int32)), jnp.int32(0)))


# --------------------------------------------------------------------------
# JAX-side wrapper
# --------------------------------------------------------------------------


def trace_regenerative_mega(scene, cam, pixel_ids, sample_ids0, seed, *,
                            width: int, height: int, sample_stride: int,
                            sample_end, spp_cap, max_depth: int, t_min: float,
                            block: int = DEFAULT_BLOCK, interpret: bool = False,
                            record_iters: int = 0):
    """Drop-in megakernel replacement for integrator.trace_regenerative
    (same signature + return contract) for scenes where supports() holds.

    Returns (radiance V3 [B] per-lane sums, segments int32); with
    ``record_iters`` > 0 returns (radiance, segments, codes [record_iters,B]
    int32) — the per-iteration residual codes of the fused differentiable
    path (mega_diff.py).  record_iters MUST bound the while trip count
    (per-lane iterations <= samples x depth, and the trip is the max over
    a block's lanes, so spp_cap * max_depth is always safe)."""
    B = pixel_ids.shape[0]
    limit = jnp.minimum(jnp.uint32(sample_end), jnp.uint32(spp_cap))

    accel = scene.n_sph_bvh_nodes > 0
    if accel:
        # Packet traversal wants the scene's tuned block (coherence unions;
        # 8192 on the random bench), not the sweep default.
        if block == DEFAULT_BLOCK:
            block = scene.bvh_block
        # Widen the packed sphere-tree rows with baked material columns:
        # slot-9 codes are order*4 + kind, so the original sphere id (and
        # its material) is recoverable for every leaf-ordered row.  Pad
        # rows (r == 0, never hit) get sphere 0's materials — inert.
        rows16 = scene.sph_bvh_rows
        orig = jnp.clip(rows16[:, 9].astype(jnp.int32) // 4, 0,
                        scene.n_spheres - 1)
        rows = jnp.concatenate(
            [rows16, _mat_cols(scene, scene.sph_mat[orig])], axis=1)
        nodes = scene.sph_bvh_nodes
    else:
        rows = pack_rows(scene)
    camc = jnp.concatenate([
        cam.origin, cam.lower_left - cam.origin, cam.horizontal, cam.vertical,
        cam.u, cam.v,
        jnp.stack([cam.lens_radius, cam.time0, cam.time1 - cam.time0]),
        scene.background,
    ]).astype(jnp.float32)
    uic = jnp.stack([jnp.uint32(seed), limit,
                     jnp.uint32(sample_stride)]).astype(jnp.uint32)

    if record_iters:
        # Residual rows live in VMEM per block (4 outputs x record_iters x
        # block x 4B); block 4096 at 128 iters = 8 MB and blows the 16 MB
        # scoped-vmem stack.  Cap so the residual footprint stays ~2 MB.
        budget = 4 * 1024 * 1024  # bytes of residual VMEM per block
        cap = max(1024, budget // (record_iters * 16) // 1024 * 1024)
        block = min(block, cap)
    pad = (-B) % block
    pixel_ids = jnp.asarray(pixel_ids, jnp.uint32)
    sample_ids0 = jnp.asarray(sample_ids0, jnp.uint32)
    if pad:
        pixel_ids = jnp.pad(pixel_ids, (0, pad))
        # Padded lanes start past the sample limit -> born dead, contribute 0.
        sample_ids0 = jnp.pad(sample_ids0, (0, pad),
                              constant_values=jnp.uint32(0xFFFFFFFF))
    fi = (pixel_ids % jnp.uint32(width)).astype(jnp.float32)
    fj = (pixel_ids // jnp.uint32(width)).astype(jnp.float32)

    from another_raytracer_tpu.ops.pallas.bvh_kernel import lane_struct, match_vma

    uic, rows, camc = match_vma(fi, uic, rows, camc)
    grid = ((B + pad) // block,)
    lane = lambda dt: lane_struct((B + pad,), dt, fi)  # noqa: E731
    ray_spec = pl.BlockSpec((block,), lambda i, *_: (i,),
                            memory_space=pltpu.VMEM)

    out_specs = [ray_spec] * 4
    out_shapes = [lane(jnp.float32)] * 3 + [lane(jnp.int32)]
    if record_iters:
        # Per-block-contiguous flat residual layout (codes + 3 throughput
        # channels): block i owns [i*record_iters*block, (i+1)*...);
        # unscrambled below.
        flat_spec = pl.BlockSpec((record_iters * block,), lambda i, *_: (i,),
                                 memory_space=pltpu.VMEM)
        out_specs.extend([flat_spec] * 4)
        out_shapes.append(lane_struct(((B + pad) * record_iters,),
                                      jnp.int32, fi))
        out_shapes.extend(
            [lane_struct(((B + pad) * record_iters,), jnp.float32, fi)] * 3)

    # The accel fold scratch refs exist only in BVH mode (+1 tid slot
    # when recording residual codes for the fused differentiable path).
    accel_scratch = (
        [pltpu.VMEM((block,), jnp.float32)] * (14 + (1 if record_iters else 0))
        if accel else [])
    scratch_shapes = (
        accel_scratch
        + [pltpu.VMEM((block,), jnp.float32)] * 13
        + [pltpu.VMEM((block,), jnp.uint32)] * 2
        + [pltpu.VMEM((block,), jnp.int32)])

    kern = functools.partial(
        _kernel,
        n_spheres=scene.n_spheres, n_rects=scene.n_rects,
        mat_kinds=scene.mat_kinds, tex_kinds=scene.tex_kinds,
        has_lens=cam.has_lens, has_time=cam.has_time and scene.has_motion,
        max_depth=max_depth, t_min=t_min, width=width, height=height,
        max_iters=record_iters, n_textures=scene.tex_kind.shape[0],
        accel=accel,
        leaf_size=scene.bvh_leaf_size if accel else 0,
        n_nodes=scene.n_sph_bvh_nodes if accel else 0,
    )
    if accel:
        scalars = (
            uic, camc,
            nodes[:, 0], nodes[:, 1], nodes[:, 2],
            nodes[:, 3], nodes[:, 4], nodes[:, 5],
            nodes[:, 6].astype(jnp.int32), nodes[:, 7].astype(jnp.int32),
        )
        scalars = match_vma(fi, *scalars)
        full_rows = pl.BlockSpec(
            rows.shape, lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=len(scalars),
            grid=grid,
            in_specs=[full_rows] + [ray_spec] * 4,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(*scalars, rows, pixel_ids, fi, fj, sample_ids0)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[ray_spec] * 4,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            interpret=interpret,
        )(uic, rows, camc, pixel_ids, fi, fj, sample_ids0)
    tx, ty, tz, seg = out[:4]

    total = V3(tx[:B], ty[:B], tz[:B])
    if record_iters:
        def rows(a):
            a = a.reshape((B + pad) // block, record_iters, block)
            return a.transpose(1, 0, 2).reshape(record_iters, B + pad)[:, :B]

        codes = rows(out[4])
        tprev = V3(rows(out[5]), rows(out[6]), rows(out[7]))
        return total, jnp.sum(seg[:B]), codes, tprev
    return total, jnp.sum(seg[:B])
