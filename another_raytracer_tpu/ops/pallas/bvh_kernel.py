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
  0..2 box min, 3..5 box max, 6 escape index, 7 leaf_meta = first*32 + count
  (exact in f32 for first < 2^18; internal nodes have count = 0).
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

LEAF_SIZE = 8  # must match models/bvh.py
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
    nodes[:, 7] = tree.leaf_first * 32 + tree.leaf_count

    order = tree.prim_order
    n = order.shape[0]
    tris = np.zeros((n + LEAF_SIZE, 16), np.float32)  # pad for leaf slices
    tris[:n, 0:3] = np.asarray(tri_v0)[order]
    tris[:n, 3:6] = np.asarray(tri_v1)[order]
    tris[:n, 6:9] = np.asarray(tri_v2)[order]
    tris[:n, 9] = order
    return nodes, tris


def _kernel(lox_ref, loy_ref, loz_ref, hix_ref, hiy_ref, hiz_ref,
            esc_ref, meta_ref, tris_ref, ox, oy, oz, dx, dy, dz,
            t0_ref, i0_ref, out_t, out_i, out_hit, *, n_nodes, t_min):
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
        """Vector test of leaf triangle k (rows are leaf-ordered)."""
        row = base + k
        v0 = (tris_ref[row, 0], tris_ref[row, 1], tris_ref[row, 2])
        v1 = (tris_ref[row, 3], tris_ref[row, 4], tris_ref[row, 5])
        v2 = (tris_ref[row, 6], tris_ref[row, 7], tris_ref[row, 8])
        oid = tris_ref[row, 9]

        e1 = (v1[0] - v0[0], v1[1] - v0[1], v1[2] - v0[2])
        e2 = (v2[0] - v0[0], v2[1] - v0[1], v2[2] - v0[2])
        n = (
            e1[1] * e2[2] - e1[2] * e2[1],
            e1[2] * e2[0] - e1[0] * e2[2],
            e1[0] * e2[1] - e1[1] * e2[0],
        )
        ndotd = n[0] * d[0] + n[1] * d[1] + n[2] * d[2]
        ndotv0 = n[0] * v0[0] + n[1] * v0[1] + n[2] * v0[2]
        ndoto = n[0] * o[0] + n[1] * o[1] + n[2] * o[2]
        ok = ndotd != 0.0
        t = jnp.where(ok, (ndotv0 - ndoto) / jnp.where(ok, ndotd, 1.0), BIG)
        p = (o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2])

        def edge(a, bvert):
            e = (bvert[0] - a[0], bvert[1] - a[1], bvert[2] - a[2])
            pa = (p[0] - a[0], p[1] - a[1], p[2] - a[2])
            c = (
                e[1] * pa[2] - e[2] * pa[1],
                e[2] * pa[0] - e[0] * pa[2],
                e[0] * pa[1] - e[1] * pa[0],
            )
            return n[0] * c[0] + n[1] * c[1] + n[2] * c[2]

        valid = (
            ok & (edge(v0, v1) >= 0.0) & (edge(v1, v2) >= 0.0)
            & (edge(v2, v0) >= 0.0) & (t > t_min) & (t < best_t)
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
        count = jax.lax.rem(meta, 32)
        first = jax.lax.div(meta, 32)
        esc = esc_ref[j]

        @pl.when(any_hit & (count > 0))
        def _():
            bt = out_t[:]
            bi = out_i[:]
            hh = out_hit[:]
            for k in range(LEAF_SIZE):
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
    jax.jit, static_argnames=("block", "t_min", "interpret")
)
def bvh_closest_hit(nodes, tris, o, d, init_t, init_idx, *, block=DEFAULT_BLOCK,
                    t_min=1e-3, interpret=False):
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
        functools.partial(_kernel, n_nodes=n_nodes, t_min=t_min),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B + pad,), jnp.float32),
            jax.ShapeDtypeStruct((B + pad,), jnp.int32),
            jax.ShapeDtypeStruct((B + pad,), jnp.int32),
        ],
        interpret=interpret,
    )(*scalars, tris, *rays)

    return out_t[:B], out_i[:B], out_hit[:B].astype(bool)
