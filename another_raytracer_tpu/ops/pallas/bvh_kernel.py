"""Pallas TPU kernel: packet (speculative) BVH traversal over triangles.

The pure-XLA stackless traversal (ops/bvh.py) carries a *per-ray* node
pointer, which forces per-lane gathers of node and triangle data — the one
access pattern TPUs punish hardest.  This kernel flips the parallelism:

  * each grid program owns a block of T rays resident in VMEM lanes;
  * the whole flattened BVH (nodes packed as [M, 8] f32 rows) and the
    triangle soup (packed [N, 16] f32 rows, *pre-reordered into BVH leaf
    order* so a leaf is one contiguous dynamic slice) are staged in VMEM —
    for reference-scale meshes (capsule: 10,200 tris ≈ 5 MB) everything
    fits on-chip;
  * ONE scalar DFS cursor is shared by the block (packet traversal): per
    node, a vectorized slab test over all T rays; if *no* ray in the block
    hits the box, the whole block jumps to the node's escape index.  Leaf
    triangles are tested for all rays with plain vector ALU ops.

Scalar control flow + vector tests = zero per-lane gathers.  Coherent ray
blocks skip most of the tree; fully incoherent blocks degrade to a linear
sweep of nodes whose per-node cost is a handful of VPU ops.

Node row layout ([M, 8] f32):
  0..2 box min, 3..5 box max, 6 escape index, 7 leaf_meta = first*64 + count
  (exact in f32 for first < 2^17; internal nodes have count = 0).
Triangle row layout ([N, 16] f32): v0 xyz, v1 xyz, v2 xyz, original id.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from another_raytracer_tpu.models.bvh import FlatBVH

LEAF_SIZE = 8  # default; the actual leaf size is a kernel static arg
META_SCALE = 64  # leaf_meta = first * META_SCALE + count; count < META_SCALE
DEFAULT_BLOCK = 1024
BIG = 3e37


def pack_bvh(tree: FlatBVH, tri_v0, tri_v1, tri_v2):
    """Host-side packing -> (nodes [M,8] f32, tris [N,16] f32).

    Node rows: box bounds f32, escape index, leaf_meta — the kernel receives
    the same data *column-wise* as scalar-prefetch SMEM arrays (node scalars
    are read once per node by the shared DFS cursor; SMEM scalar loads are
    cheap, VMEM scalar loads are not).  Triangles are reordered into leaf
    order (tree.prim_order); row slot 9 carries the original triangle id.
    """
    m = tree.num_nodes
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = tree.node_min
    nodes[:, 3:6] = tree.node_max
    nodes[:, 6] = tree.escape
    assert tree.leaf_count.max() < META_SCALE
    nodes[:, 7] = tree.leaf_first * META_SCALE + tree.leaf_count

    order = tree.prim_order
    n = order.shape[0]
    pad = max(int(tree.leaf_count.max()), 1)
    tris = np.zeros((n + pad, 16), np.float32)  # pad for leaf slices
    tris[:n, 0:3] = np.asarray(tri_v0)[order]
    tris[:n, 3:6] = np.asarray(tri_v1)[order]
    tris[:n, 6:9] = np.asarray(tri_v2)[order]
    tris[:n, 9] = order
    return nodes, tris


def _kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
            esc_ref, meta_ref, tris_ref, ox, oy, oz, dx, dy, dz,
            t0_ref, i0_ref, out_t, out_i, out_hit, *, n_nodes, t_min,
            leaf_size):
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])

    def safe_inv(c):
        return 1.0 / jnp.where(jnp.abs(c) < 1e-20, jnp.where(c < 0, -1e-20, 1e-20), c)

    inv = (safe_inv(d[0]), safe_inv(d[1]), safe_inv(d[2]))
    los = (lox_ref, loy_ref, loz_ref)
    his = (hix_ref, hiy_ref, hiz_ref)

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
        v0 = (tris_ref[row, 0], tris_ref[row, 1], tris_ref[row, 2])
        v1 = (tris_ref[row, 3], tris_ref[row, 4], tris_ref[row, 5])
        v2 = (tris_ref[row, 6], tris_ref[row, 7], tris_ref[row, 8])
        oid = tris_ref[row, 9]

        def cross(a, b):
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])

        def sub(a, b):
            return (a[0] - b[0], a[1] - b[1], a[2] - b[2])

        def sdot(a, b):  # scalar . scalar
            return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]

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

        def edge(m, c):
            return p[0] * m[0] + p[1] * m[1] + p[2] * m[2] >= c

        valid = (
            ok & edge(m0, c0) & edge(m1, c1) & edge(m2, c2)
            & (t > t_min) & (t < best_t)
        )
        return t, valid, oid

    # Vector state lives in the output refs (updated in place); the
    # while_loop carries only the scalar DFS cursor — Mosaic legalizes
    # scalar-predicated branches (pl.when) but not value-yielding scf.if
    # over vector carries.
    out_t[:] = t0_ref[:]
    out_i[:] = i0_ref[:]
    out_hit[:] = jnp.zeros_like(i0_ref[:])

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
            for k in range(leaf_size):
                t, valid, oid = tri_test(first, k, bt)
                valid = valid & (k < count) & hit_box
                bt = jnp.where(valid, t, bt)
                bi = jnp.where(valid, oid.astype(jnp.int32), bi)
                hh = jnp.where(valid, 1, hh)
            out_t[:] = bt
            out_i[:] = bi
            out_hit[:] = hh

        return jnp.where(any_hit, j + 1, esc)

    jax.lax.while_loop(lambda j: j < n_nodes, body, jnp.int32(0))


@functools.partial(
    jax.jit, static_argnames=("block", "t_min", "interpret", "leaf_size")
)
def bvh_closest_hit(nodes, tris, o, d, init_t, init_idx, *, block=DEFAULT_BLOCK,
                    t_min=1e-3, interpret=False, leaf_size=LEAF_SIZE):
    """Packet-traversal closest hit.

    Args:
      nodes: [M,8] f32 packed nodes (pack_bvh).
      tris: [N+pad,16] f32 packed, leaf-ordered triangles.
      o, d: V3 of [B] ray components.
      init_t: [B] current best t (from other primitive kinds).
      init_idx: [B] current best within-kind index.
    Returns (t [B], idx [B] original triangle ids, improved [B] bool).
    """
    B = o.x.shape[0]
    n_nodes = nodes.shape[0]
    pad = (-B) % block
    padded = lambda a: jnp.pad(a, (0, pad)) if pad else a  # noqa: E731

    rays = [padded(a) for a in (o.x, o.y, o.z, d.x, d.y, d.z, init_t)]
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=grid,
        in_specs=[full(tris)] + [ray_spec] * 8,
        out_specs=[ray_spec] * 3,
    )

    out_t, out_i, out_hit = pl.pallas_call(
        functools.partial(_kernel, n_nodes=n_nodes, t_min=t_min,
                          leaf_size=leaf_size),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B + pad,), jnp.float32),
            jax.ShapeDtypeStruct((B + pad,), jnp.int32),
            jax.ShapeDtypeStruct((B + pad,), jnp.int32),
        ],
        interpret=interpret,
    )(*scalars, tris, *rays)

    return out_t[:B], out_i[:B], out_hit[:B].astype(bool)
