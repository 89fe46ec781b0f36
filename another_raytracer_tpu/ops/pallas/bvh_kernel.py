"""Pallas TPU kernels: packet (speculative) BVH traversal.

The pure-XLA stackless traversal (ops/bvh.py) carries a *per-ray* node
pointer, which forces per-lane gathers of node and primitive data — the one
access pattern TPUs punish hardest.  These kernels flip the parallelism:

  * each grid program owns a block of T rays resident in VMEM lanes;
  * the whole flattened BVH (nodes packed as [M, 8] f32 rows) and the
    primitive soup (packed [N, 16] f32 rows, *pre-reordered into BVH leaf
    order* so a leaf is one contiguous dynamic slice) are staged in VMEM —
    for reference-scale scenes (capsule mesh: 10,200 tris ≈ 5 MB) everything
    fits on-chip;
  * ONE scalar DFS cursor is shared by the block (packet traversal): per
    node, a vectorized slab test over all T rays; if *no* ray in the block
    hits the box, the whole block jumps to the node's escape index.  Leaf
    primitives are tested for all rays with plain vector ALU ops.

Scalar control flow + vector tests = zero per-lane gathers.  Coherent ray
blocks skip most of the tree; fully incoherent blocks degrade to a linear
sweep of nodes whose per-node cost is a handful of VPU ops.

Two primitive row formats share one traversal skeleton (``prim`` static arg):

``prim='planar'`` — triangles, including the two world-space triangles each
accelerated axis-rect is split into for the *winner search* (the hit record
is recomputed from the original rect parameters, ops/intersect.py):
  0..2 v0, 3..5 v1, 6..8 v2, 9 code.

``prim='sphere'`` — static & moving spheres with transforms baked into world
centers (a rigid transform maps a sphere to a sphere; lerp commutes with the
affine map, so t values are identical to the object-space test):
  0..2 c0 (world center at t0), 3..5 c1-c0, 6 t0, 7 1/(t1-t0), 8 r, 9 code.

``prim='rect'`` — IDENTITY-transform axis-aligned rects tested natively
(plane solve + inclusive 2D bound check, the exact aarect.cpp semantics of
the [B, N] sweep — no quad split, so no shared-diagonal or degenerate-rect
divergence, and one rect costs ~half of two triangle tests):
  0 axis (0/1/2 as f32), 1 k, 2 lo_u, 3 lo_v, 4 hi_u, 5 hi_v, 9 code.
Rects with non-identity transforms still go through the planar tree as two
world-space quad triangles (scene.py `_rect_quads`).

``code`` encodes (within-kind id, primitive kind) as ``id * 4 + kind`` using
the scene kind constants — exact in f32 for id < 2^22.

Node row layout ([M, 8] f32):
  0..2 box min, 3..5 box max, 6 escape index, 7 leaf_meta = first*64 + count
  (exact in f32 for first < 2^17; internal nodes have count = 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from another_raytracer_tpu.models.bvh import FlatBVH

META_SCALE = 64  # leaf_meta = first * META_SCALE + count; count < META_SCALE
DEFAULT_BLOCK = 1024
BIG = 3e37


def lane_struct(shape, dtype, like):
    """ShapeDtypeStruct carrying ``like``'s varying-axes type: under
    shard_map(check_vma=True) pallas_call outputs must declare their vma."""
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def match_vma(like, *arrays):
    """Promote replicated operands to ``like``'s varying-axes type with
    lax.pvary: under shard_map(check_vma=True) a Pallas kernel's body mixes
    block operands freely, so every input must enter uniformly varying
    (replicated scene tables meet device-varying rays here)."""
    vma = getattr(jax.typeof(like), "vma", None)
    if not vma:
        return arrays
    out = []
    for a in arrays:
        need = tuple(vma - getattr(jax.typeof(a), "vma", frozenset()))
        out.append(jax.lax.pvary(a, need) if need else a)
    return tuple(out)


def pack_nodes(tree: FlatBVH) -> np.ndarray:
    """Host-side node packing -> [M,8] f32 (see module docstring)."""
    m = tree.num_nodes
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = tree.node_min
    nodes[:, 3:6] = tree.node_max
    nodes[:, 6] = tree.escape
    assert tree.leaf_count.max() < META_SCALE
    nodes[:, 7] = tree.leaf_first * META_SCALE + tree.leaf_count
    return nodes


def _leaf_rows(tree: FlatBVH, n_cols: int = 16) -> np.ndarray:
    order = tree.prim_order
    pad = max(int(tree.leaf_count.max()), 1)
    return np.zeros((order.shape[0] + pad, n_cols), np.float32)


def pack_planar(tree: FlatBVH, v0, v1, v2, codes, uv0=None, uv1=None,
                uv2=None, mats=None) -> tuple:
    """(nodes [M,8], rows [N+pad,16 or 24]) for the planar kernel.

    ``codes``: [N] int array, ``id * 4 + kind`` per primitive in build order.
    Rows are reordered into leaf order (tree.prim_order); trailing pad rows
    are all-zero (degenerate normal -> never hit).

    ``uv0/uv1/uv2`` ([N,2]) and ``mats`` ([N]), when given, widen the rows
    to 24 columns — 10,11 uv0; 12,13 uv1; 14,15 uv2; 16 mat — enabling the
    FULL winner-record fold (tu, tv, mat computed in-kernel, zero
    shading-stage gathers).  Physically free: a [N,16] f32 VMEM tile
    already pads its minor dim to 128 lanes.  Rows with unknown texcoords
    (rect quads) pass zeros; their records are recomputed from rect
    parameters anyway."""
    codes = np.asarray(codes, np.int64)
    assert codes.max(initial=0) < (1 << 24), "code must be exact in f32"
    order = tree.prim_order
    n = order.shape[0]
    full = uv0 is not None
    rows = _leaf_rows(tree, 35 if full else 16)
    rows[:n, 0:3] = np.asarray(v0)[order]
    rows[:n, 3:6] = np.asarray(v1)[order]
    rows[:n, 6:9] = np.asarray(v2)[order]
    rows[:n, 9] = codes[order]
    if full:
        rows[:n, 10:12] = np.asarray(uv0)[order]
        rows[:n, 12:14] = np.asarray(uv1)[order]
        rows[:n, 14:16] = np.asarray(uv2)[order]
        assert np.asarray(mats).max(initial=0) < (1 << 24)
        rows[:n, 16] = np.asarray(mats, np.int64)[order]
        # Precomputed per-triangle leaf-test geometry (cols 17-34): the
        # kernel's scalar unit otherwise re-derives these at EVERY
        # (node, block) visit.  Computed in f32 with the same op order as
        # tri_test's scalar section, so values match at fma-contraction
        # ulp level.  Pad rows stay zero: n = 0 -> ndotd = 0 -> never hit.
        f1 = lambda a: np.asarray(a, np.float32)  # noqa: E731
        av0, av1, av2 = f1(rows[:n, 0:3]), f1(rows[:n, 3:6]), f1(rows[:n, 6:9])
        nn = np.cross(av1 - av0, av2 - av0).astype(np.float32)
        m0 = np.cross(nn, av1 - av0).astype(np.float32)
        m1 = np.cross(nn, av2 - av1).astype(np.float32)
        m2 = np.cross(nn, av0 - av2).astype(np.float32)
        n2 = (nn * nn).sum(1)
        rows[:n, 17:20] = nn
        rows[:n, 20] = (nn * av0).sum(1)
        rows[:n, 21:24] = m0
        rows[:n, 24:27] = m1
        rows[:n, 27:30] = m2
        rows[:n, 30] = (m0 * av0).sum(1)
        rows[:n, 31] = (m1 * av1).sum(1)
        rows[:n, 32] = (m2 * av2).sum(1)
        rows[:n, 33] = 1.0 / np.maximum(n2, 1e-37)
        rows[:n, 34] = 1.0 / np.sqrt(np.maximum(n2, 1e-37))
    return pack_nodes(tree), rows


def pack_bvh(tree: FlatBVH, tri_v0, tri_v1, tri_v2):
    """Back-compat triangle-only packing: codes = id*4 + PRIM_TRIANGLE."""
    from another_raytracer_tpu.models.scene import PRIM_TRIANGLE

    n = tree.prim_order.shape[0]
    codes = np.arange(n, dtype=np.int64) * 4 + PRIM_TRIANGLE
    return pack_planar(tree, tri_v0, tri_v1, tri_v2, codes)


def pack_rects(tree: FlatBVH, axis, k, lo, hi, codes) -> tuple:
    """(nodes [M,8], rows [N+pad,16]) for the rect kernel (identity-transform
    axis rects only; see module docstring row format).  Pad rows get
    inverted u-bounds (lo_u=1 > hi_u=0) so they can never test inside."""
    codes = np.asarray(codes, np.int64)
    assert codes.max(initial=0) < (1 << 24)
    order = tree.prim_order
    n = order.shape[0]
    rows = _leaf_rows(tree)
    rows[:n, 0] = np.asarray(axis, np.float64)[order]
    rows[:n, 1] = np.asarray(k, np.float64)[order]
    rows[:n, 2] = np.asarray(lo, np.float64)[order, 0]
    rows[:n, 3] = np.asarray(lo, np.float64)[order, 1]
    rows[:n, 4] = np.asarray(hi, np.float64)[order, 0]
    rows[:n, 5] = np.asarray(hi, np.float64)[order, 1]
    rows[:n, 9] = codes[order]
    rows[n:, 2] = 1.0  # lo_u > hi_u: unhittable pad
    return pack_nodes(tree), rows


def pack_spheres(tree: FlatBVH, c0_w, c1_w, t0, t1, r, mats=None,
                 has_uv=None) -> tuple:
    """(nodes [M,8], rows [N+pad,16]) for the sphere kernel.  Centers are
    WORLD-space (transforms baked); zero pad rows are never hit (r = 0 gives
    disc <= 0 by Cauchy-Schwarz).  ``mats``/``has_uv``, when given, fill
    cols 10/11 for the in-kernel winner-record fold."""
    from another_raytracer_tpu.models.scene import PRIM_SPHERE

    order = tree.prim_order
    n = order.shape[0]
    assert n < (1 << 22)
    rows = _leaf_rows(tree)
    if mats is not None:
        assert np.asarray(mats).max(initial=0) < (1 << 24)
        rows[:n, 10] = np.asarray(mats, np.int64)[order]
        rows[:n, 11] = np.asarray(has_uv, np.float64)[order]
    c0_w = np.asarray(c0_w, np.float64)[order]
    c1_w = np.asarray(c1_w, np.float64)[order]
    t0 = np.asarray(t0, np.float64)[order]
    t1 = np.asarray(t1, np.float64)[order]
    rows[:n, 0:3] = c0_w
    rows[:n, 3:6] = c1_w - c0_w
    rows[:n, 6] = t0
    dt = t1 - t0
    rows[:n, 7] = np.where(dt != 0.0, 1.0 / np.where(dt != 0.0, dt, 1.0), 0.0)
    rows[:n, 8] = np.asarray(r, np.float64)[order]
    rows[:n, 9] = order * 4 + PRIM_SPHERE
    return pack_nodes(tree), rows


def _kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
            esc_ref, meta_ref, rows_ref, ox, oy, oz, dx, dy, dz, tm,
            t0_ref, i0_ref, out_t, out_i, out_hit, *aux_refs, n_nodes, t_min,
            leaf_size, prim, fold_record=False, fold_full=False,
            precomp=False):
    if fold_record:
        # Winner-record folding ('planar' only): the leaf test already has
        # the triangle's scalar normal and the edge-function values, so the
        # kernel returns the winner's UNIT normal and area-ratio
        # barycentrics — the forward shading path then skips the vertex
        # half of the [N,16] winner-record gather + padded column unpack
        # (round-4 mesh profile: 179 ms of the 527 ms bench).
        # ``fold_full`` additionally folds the interpolated texcoords
        # (tu, tv — the uv corners are SCALAR row reads, so the vector cost
        # is 6 multiply-adds per leaf test) and the material id, removing
        # the winner-record gather from the shading stage ENTIRELY.
        if fold_full:
            (out_nx, out_ny, out_nz, out_u, out_v,
             out_tu, out_tv, out_m) = aux_refs
        else:
            out_nx, out_ny, out_nz, out_u, out_v = aux_refs
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c)

    inv = (safe_inv(d[0]), safe_inv(d[1]), safe_inv(d[2]))
    los = (lox_ref, loy_ref, loz_ref)
    his = (hix_ref, hiy_ref, hiz_ref)

    if prim == "sphere":
        time = tm[:]
        a_vec = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
        inv_a = 1.0 / jnp.where(a_vec > 0.0, a_vec, 1.0)

    def slab(j, best_t):
        tn = jnp.full_like(best_t, t_min)
        tf = best_t
        for c in range(3):
            lo = los[c][j]
            hi = his[c][j]
            a = (lo - o[c]) * inv[c]
            b = (hi - o[c]) * inv[c]
            tn = jnp.maximum(tn, jnp.minimum(a, b))
            tf = jnp.minimum(tf, jnp.maximum(a, b))
        return tn < tf

    def tri_test(base, k, best_t):
        """Vector test of leaf triangle k (rows are leaf-ordered).

        Per-triangle geometry (normal, edge half-plane coefficients) is pure
        SCALAR arithmetic — the scalar unit computes it concurrently with the
        VPU — so the vector work per (triangle, block) is only the ops that
        touch o/d/p.  The edge test uses the triple-product identity
        n . ((b-a) x (p-a)) = p . m - a . m with m = n x (b-a): three
        multiply-adds + a compare per edge instead of a per-lane cross
        product (~1.7x fewer vector ops than the direct form; same sign,
        rounding differs at ulp level)."""
        row = base + k
        oid = rows_ref[row, 9]

        def sdot(a, b):  # scalar . scalar
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

        if precomp:
            # Host-precomputed leaf-test geometry (pack_planar cols
            # 17-34): the scalar unit just loads instead of re-deriving
            # 3 crosses + 4 dots per (triangle, block) visit.
            n = (rows_ref[row, 17], rows_ref[row, 18], rows_ref[row, 19])
            ndotv0 = rows_ref[row, 20]
            m0 = (rows_ref[row, 21], rows_ref[row, 22], rows_ref[row, 23])
            m1 = (rows_ref[row, 24], rows_ref[row, 25], rows_ref[row, 26])
            m2 = (rows_ref[row, 27], rows_ref[row, 28], rows_ref[row, 29])
            c0 = rows_ref[row, 30]
            c1 = rows_ref[row, 31]
            c2 = rows_ref[row, 32]
        else:
            v0 = (rows_ref[row, 0], rows_ref[row, 1], rows_ref[row, 2])
            v1 = (rows_ref[row, 3], rows_ref[row, 4], rows_ref[row, 5])
            v2 = (rows_ref[row, 6], rows_ref[row, 7], rows_ref[row, 8])

            def cross(a, b):
                return (a[1] * b[2] - a[2] * b[1],
                        a[2] * b[0] - a[0] * b[2],
                        a[0] * b[1] - a[1] * b[0])

            def sub(a, b):
                return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

            # --- scalar per-triangle precompute ---
            n = cross(sub(v1, v0), sub(v2, v0))
            ndotv0 = sdot(n, v0)
            m0 = cross(n, sub(v1, v0))
            m1 = cross(n, sub(v2, v1))
            m2 = cross(n, sub(v0, v2))
            c0 = sdot(m0, v0)
            c1 = sdot(m1, v1)
            c2 = sdot(m2, v2)

        # --- vector part ---
        ndotd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
        ndoto = n[0] * o[0] + n[1] * o[1] + n[2] * o[2]
        ok = ndotd != 0.0
        t = jnp.where(ok, (ndotv0 - ndoto) / jnp.where(ok, ndotd, 1.0), BIG)
        p = (o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2])

        def edge_val(m, c):
            return p[0] * m[0] + p[1] * m[1] + p[2] * m[2] - c

        w0 = edge_val(m0, c0)
        w1 = edge_val(m1, c1)
        w2 = edge_val(m2, c2)
        valid = (
            ok & (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0)
            & (t > t_min) & (t < best_t)
        )
        if fold_record and prim == "planar":
            # u weights vertex 1 (edge m1), v weights vertex 2 (edge m2):
            # the XLA record's dot(n, cross(e, p - a)) / |n|^2 by the same
            # triple-product identity the edge test uses (triangle.h:62-84).
            if precomp:
                inv_n2 = rows_ref[row, 33]
                inv_len = rows_ref[row, 34]
            else:
                inv_n2 = 1.0 / jnp.maximum(sdot(n, n), 1e-37)
                inv_len = jax.lax.rsqrt(jnp.maximum(sdot(n, n), 1e-37))
            uu = w1 * inv_n2
            vv = w2 * inv_n2
            aux = ((n[0] * inv_len, n[1] * inv_len, n[2] * inv_len), uu, vv)
            if fold_full:
                # Interpolated texcoords, exactly _triangle_record's
                # tu = u*uv0u + v*uv1u + (1-u-v)*uv2u: rewritten around the
                # vertex-2 corner so the vector cost is 2 fused
                # multiply-adds per channel (uv corners are scalar reads).
                uv0u = rows_ref[row, 10]
                uv0v = rows_ref[row, 11]
                uv1u = rows_ref[row, 12]
                uv1v = rows_ref[row, 13]
                uv2u = rows_ref[row, 14]
                uv2v = rows_ref[row, 15]
                matv = rows_ref[row, 16]
                tu = uv2u + uu * (uv0u - uv2u) + vv * (uv1u - uv2u)
                tv = uv2v + uu * (uv0v - uv2v) + vv * (uv1v - uv2v)
                aux = aux + (tu, tv, matv)
            return t, valid, oid, aux
        return t, valid, oid

    def sphere_test(base, k, best_t):
        """Vector test of leaf sphere k: half-b quadratic against the
        time-lerped world center (sphere.h:39-65, moving_sphere.h:29-31).
        Static spheres carry cd = 0 so the lerp is inert; canonical scenes
        use (t0, t1) = (0, 1) so the stored 1/(t1-t0) multiply is exactly
        the reference's division."""
        row = base + k
        c0 = (rows_ref[row, 0], rows_ref[row, 1], rows_ref[row, 2])
        cd = (rows_ref[row, 3], rows_ref[row, 4], rows_ref[row, 5])
        st0 = rows_ref[row, 6]
        inv_dt = rows_ref[row, 7]
        r = rows_ref[row, 8]
        oid = rows_ref[row, 9]

        frac = (time - st0) * inv_dt
        cx = c0[0] + frac * cd[0]
        cy = c0[1] + frac * cd[1]
        cz = c0[2] + frac * cd[2]
        ocx = o[0] - cx
        ocy = o[1] - cy
        ocz = o[2] - cz
        half_b = ocx * d[0] + ocy * d[1] + ocz * d[2]
        c = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = half_b * half_b - a_vec * c
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.where(ok, disc, 0.0))
        root1 = (-half_b - sq) * inv_a
        root2 = (-half_b + sq) * inv_a
        r1_ok = (root1 > t_min) & (root1 < best_t)
        t = jnp.where(r1_ok, root1, root2)
        valid = ok & (t > t_min) & (t < best_t)
        if fold_record:
            # Winner-record fold for spheres: world outward normal
            # (p - c)/r — /r keeps the negative-radius (hollow dielectric)
            # sign exactly like _sphere_record — plus mat id and has_uv
            # from cols 10/11; the shading stage then computes UV from the
            # folded normal with NO winner-record gather (identity sphere
            # transforms only; gated in intersect.closest_hit).
            inv_r = 1.0 / jnp.where(r != 0.0, r, 1.0)
            nx = (ocx + t * d[0]) * inv_r
            ny = (ocy + t * d[1]) * inv_r
            nz = (ocz + t * d[2]) * inv_r
            aux = ((nx, ny, nz), rows_ref[row, 10], rows_ref[row, 11])
            return t, valid, oid, aux
        return t, valid, oid

    def rect_test(base, k, best_t):
        """Vector test of leaf axis-rect k: exactly the [B, N] sweep's
        plane-solve + inclusive bound check (ops/intersect._rect_t,
        aarect.cpp semantics), so winner t values match the sweep
        bit-for-bit.  The axis id is SCALAR per row, so the component picks
        are scalar-predicated vector selects — cheap VPU ops, no gathers."""
        row = base + k
        ax = rows_ref[row, 0]
        kk = rows_ref[row, 1]
        lo0 = rows_ref[row, 2]
        lo1 = rows_ref[row, 3]
        hi0 = rows_ref[row, 4]
        hi1 = rows_ref[row, 5]
        oid = rows_ref[row, 9]

        is0 = ax == 0.0
        is2 = ax == 2.0
        o_ax = jnp.where(is0, o[0], jnp.where(is2, o[2], o[1]))
        d_ax = jnp.where(is0, d[0], jnp.where(is2, d[2], d[1]))
        parallel = d_ax == 0.0
        t = jnp.where(parallel, BIG,
                      (kk - o_ax) / jnp.where(parallel, 1.0, d_ax))
        # free axes ascending: axis 0 -> (1,2), 1 -> (0,2), 2 -> (0,1)
        o_au = jnp.where(is0, o[1], o[0])
        d_au = jnp.where(is0, d[1], d[0])
        o_av = jnp.where(is2, o[1], o[2])
        d_av = jnp.where(is2, d[1], d[2])
        pu = o_au + t * d_au
        pv = o_av + t * d_av
        inside = (pu >= lo0) & (pu <= hi0) & (pv >= lo1) & (pv <= hi1)
        valid = inside & (t > t_min) & (t < best_t) & ~parallel
        return t, valid, oid

    prim_test = {"planar": tri_test, "sphere": sphere_test,
                 "rect": rect_test}[prim]

    # Vector state lives in the output refs (updated in place); the
    # while_loop carries only the scalar DFS cursor — Mosaic legalizes
    # scalar-predicated branches (pl.when) but not value-yielding scf.if
    # over vector carries.
    out_t[:] = t0_ref[:]
    out_i[:] = i0_ref[:]
    out_hit[:] = jnp.zeros_like(i0_ref[:])
    if fold_record:
        z = jnp.zeros_like(t0_ref[:])
        out_nx[:] = z
        out_ny[:] = z
        out_nz[:] = z
        out_u[:] = z
        out_v[:] = z
        if fold_full:
            out_tu[:] = z
            out_tv[:] = z
            out_m[:] = z

    def body(j):
        best_t = out_t[:]
        hit_box = slab(j, best_t)
        any_hit = jnp.any(hit_box)
        meta = meta_ref[j]
        count = jax.lax.rem(meta, META_SCALE)
        first = jax.lax.div(meta, META_SCALE)
        esc = esc_ref[j]

        @pl.when(any_hit & (count > 0))
        def _():
            bt = out_t[:]
            bi = out_i[:]
            hh = out_hit[:]
            if fold_record:
                bn = (out_nx[:], out_ny[:], out_nz[:])
                bu = out_u[:]
                bv = out_v[:]
                if fold_full:
                    btu = out_tu[:]
                    btv = out_tv[:]
                    bm = out_m[:]
            for k in range(leaf_size):
                if fold_record:
                    t, valid, oid, aux = prim_test(first, k, bt)
                else:
                    t, valid, oid = prim_test(first, k, bt)
                valid = valid & (k < count) & hit_box
                bt = jnp.where(valid, t, bt)
                bi = jnp.where(valid, oid.astype(jnp.int32), bi)
                hh = jnp.where(valid, 1, hh)
                if fold_record:
                    nsc, uu, vv = aux[:3]
                    bn = tuple(jnp.where(valid, nsc[c], bn[c])
                               for c in range(3))
                    bu = jnp.where(valid, uu, bu)
                    bv = jnp.where(valid, vv, bv)
                    if fold_full:
                        tu, tv, matv = aux[3:]
                        btu = jnp.where(valid, tu, btu)
                        btv = jnp.where(valid, tv, btv)
                        bm = jnp.where(valid, matv, bm)
            out_t[:] = bt
            out_i[:] = bi
            out_hit[:] = hh
            if fold_record:
                out_nx[:], out_ny[:], out_nz[:] = bn
                out_u[:] = bu
                out_v[:] = bv
                if fold_full:
                    out_tu[:] = btu
                    out_tv[:] = btv
                    out_m[:] = bm

        return jnp.where(any_hit, j + 1, esc)

    jax.lax.while_loop(lambda j: j < n_nodes, body, jnp.int32(0))


@functools.partial(
    jax.jit,
    static_argnames=("block", "t_min", "interpret", "leaf_size", "prim",
                     "fold_record", "fold_full", "precomp"),
)
def bvh_closest_hit(nodes, rows, o, d, init_t, init_idx, *, leaf_size,
                    block=DEFAULT_BLOCK, t_min=1e-3, interpret=None,
                    prim="planar", time=None, fold_record=False,
                    fold_full=False, precomp=False):
    """Packet-traversal closest hit.

    Args:
      nodes: [M,8] f32 packed nodes (pack_nodes).
      rows: [N+pad,16] f32 packed, leaf-ordered primitive rows.
      o, d: V3 of [B] ray components.
      init_t: [B] current best t (from other primitive kinds).
      init_idx: [B] current best code/index (copied through for non-improved
        lanes).
      leaf_size: REQUIRED — must equal the leaf size the tree was built with
        (the kernel unrolls exactly this many masked tests per leaf; a
        smaller value silently skips the tail of every leaf).
      prim: 'planar' (triangles/quads) or 'sphere'.
      time: [B] ray times (sphere lerp); zeros when None.
    Returns (t [B], code [B] int32 — row slot 9 where improved, else the
    init value — , improved [B] bool); with ``fold_record`` (planar only),
    additionally (n V3 unit normal, u [B], v [B]) of the winning triangle
    for improved lanes (garbage elsewhere — consumers must mask on the
    final winner kind).  With ``fold_full`` (requires 24-col rows packed
    with uv/mat, see pack_planar), additionally (tu [B], tv [B],
    mat [B] f32) — the shading stage then needs NO winner-record gather.
    """
    assert not (fold_record and prim not in ("planar", "sphere"))
    assert not (fold_full and prim != "planar")
    assert not (fold_full and not fold_record)
    assert not (fold_full and rows.shape[1] < 17), "rows lack uv/mat columns"
    assert not (precomp and (prim != "planar" or rows.shape[1] < 35)), \
        "precomp needs 35-col planar rows"
    if interpret is None:
        # Auto: Mosaic needs a real TPU; CPU runs (e.g. the multichip CPU
        # dryrun exercising shard_map x packet-kernel composition with a
        # pallas_bvh=True scene) fall back to the Pallas interpreter.
        interpret = jax.default_backend() in ("cpu",)
    B = o.x.shape[0]
    n_nodes = nodes.shape[0]
    pad = (-B) % block
    padded = lambda a: jnp.pad(a, (0, pad)) if pad else a  # noqa: E731

    if time is None:
        time = jnp.zeros_like(o.x)
    rays = [padded(a) for a in (o.x, o.y, o.z, d.x, d.y, d.z, time, init_t)]
    rays.append(padded(init_idx))
    grid = ((B + pad) // block,)

    # index maps receive (grid idx, *scalar_prefetch_refs)
    ray_spec = pl.BlockSpec((block,), lambda i, *_: (i,), memory_space=pltpu.VMEM)
    full = lambda arr: pl.BlockSpec(  # noqa: E731
        arr.shape, lambda i, *_: tuple(0 for _ in arr.shape),
        memory_space=pltpu.VMEM,
    )

    # Node scalar columns go through scalar prefetch (SMEM).
    scalars = (
        nodes[:, 0], nodes[:, 1], nodes[:, 2],
        nodes[:, 3], nodes[:, 4], nodes[:, 5],
        nodes[:, 6].astype(jnp.int32), nodes[:, 7].astype(jnp.int32),
    )
    promoted = match_vma(rays[0], *scalars, rows)
    scalars, rows = promoted[:-1], promoted[-1]

    n_aux = (8 if fold_full else 5) if fold_record else 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=grid,
        in_specs=[full(rows)] + [ray_spec] * 9,
        out_specs=[ray_spec] * (3 + n_aux),
    )

    f32l = lambda: lane_struct((B + pad,), jnp.float32, rays[0])  # noqa: E731
    out_shape = [
        f32l(),
        lane_struct((B + pad,), jnp.int32, rays[0]),
        lane_struct((B + pad,), jnp.int32, rays[0]),
    ] + [f32l()] * n_aux
    out = pl.pallas_call(
        functools.partial(_kernel, n_nodes=n_nodes, t_min=t_min,
                          leaf_size=leaf_size, prim=prim,
                          fold_record=fold_record, fold_full=fold_full,
                          precomp=precomp),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*scalars, rows, *rays)
    out_t, out_i, out_hit = out[:3]

    if fold_record:
        from another_raytracer_tpu.ops.vec3 import V3

        aux = [a[:B] for a in out[3:]]
        nx, ny, nz, uu, vv = aux[:5]
        base = (out_t[:B], out_i[:B], out_hit[:B].astype(bool),
                V3(nx, ny, nz), uu, vv)
        if fold_full:
            return base + tuple(aux[5:])  # tu, tv, mat (f32)
        return base
    return out_t[:B], out_i[:B], out_hit[:B].astype(bool)
