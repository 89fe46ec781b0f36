"""Pallas TPU kernel: gradient Perlin noise via in-register lane gathers.

The XLA formulation (ops/shade.perlin_noise) reads its 256-entry tables
through one-hot matmuls — the right call against XLA's serial gather
emitter, but the round-3 HLO/trace shows its true cost: each of the 11
dot_generals materializes a [B, 256] f32 one-hot (92 MB at B=90k) to HBM
and lowers to a VPU convolution emitter (EmitOutputBatchInLanesInput-
BatchInSublanes), ~89 us/call — 11 x 49 iterations = 48 ms = ~46% of the
textures bench.  The tables themselves are 3 KB; the arithmetic is
trivial; all the cost is materialized-one-hot bandwidth.

Here every table read is a ``tpu.dynamic_gather`` (jnp.take_along_axis
along lanes) on VMEM-resident [8, 128] tiles: a 256-entry lookup is two
half-table lane-gathers + a select, entirely in registers.  The whole
perlin evaluation (lattice hash, 8 corner gradients, Hermite trilinear
blend — perlin.h:29-96 semantics, bit-mirroring ops/shade.perlin_noise)
runs as ONE kernel over the ray batch with zero HBM intermediates.

Constraints (see ``supports``): one perlin instance (Q == 1 — true for
the textures and final bench scenes; multi-instance scenes keep the
one-hot path), forward-only (``fast_texel`` callers; the differentiable
path keeps the one-hot Lookups so noise gradients w.r.t. hit points flow).

Mosaic notes that shaped this implementation:
  * dynamic_gather operands must be plainly-laid-out values — a
    broadcast_to'd row or a 1D->2D in-kernel reshape fails to compile, so
    lane state arrives pre-shaped [rows, 128] and tables arrive
    pre-broadcast as [8, 128] tiles packed into one input;
  * int32<->f32 casts are supported (uint32->f32 is not): perm tables are
    carried as f32 (values < 256, exact) and cast to int32 for the xor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from another_raytracer_tpu.models import scene as scene_lib
from another_raytracer_tpu.ops.vec3 import V3

PERLIN_N = scene_lib.PERLIN_POINT_COUNT  # 256

# Module A/B knob (scripts/ab_perlin_kernel.py): None = auto (TPU +
# supports()); False = off.  Trace-time flag (CLAUDE.md rule 11).
PERLIN_KERNEL = None

# Table pack layout: 18 half-tables, each an [8, 128] tile (row-replicated
# 128-wide half of a 256-entry table), stacked into [18*8, 128]:
#   slot 0..5 : perm lo/hi per axis   (x lo, x hi, y lo, y hi, z lo, z hi)
#   slot 6..11: rolled perm lo/hi per axis
#   slot 12..17: ranvec lo/hi per component (x lo, x hi, y, ..., z hi)
_N_SLOTS = 18


def supports(scene) -> bool:
    return scene.per_perm.shape[0] == 1


def enabled(scene) -> bool:
    if PERLIN_KERNEL is False:
        return False
    return supports(scene) and jax.default_backend() not in ("cpu",)


def _pack_tables(scene):
    """[18*8, 128] f32 table pack (traced; tables are tiny)."""
    perm = scene.per_perm[0].astype(jnp.float32)  # [3, 256]
    perm_roll = jnp.roll(perm, -1, axis=1)
    ran = scene.per_ranvec[0]  # [256, 3]
    halves = []
    for tab in (perm[0], perm[1], perm[2],
                perm_roll[0], perm_roll[1], perm_roll[2],
                ran[:, 0], ran[:, 1], ran[:, 2]):
        halves.append(tab[:128])
        halves.append(tab[128:])
    stack = jnp.stack(halves)  # [18, 128]
    return jnp.broadcast_to(stack[:, None, :], (_N_SLOTS, 8, 128)).reshape(
        _N_SLOTS * 8, 128)


def _kernel(tab_ref, px_ref, py_ref, pz_ref, out_ref, *, rows):
    def half(slot):
        return tab_ref[slot * 8:(slot + 1) * 8, :]

    for s in range(rows // 8):
        sl = slice(s * 8, (s + 1) * 8)
        px, py, pz = px_ref[sl, :], py_ref[sl, :], pz_ref[sl, :]

        fx, fy, fz = jnp.floor(px), jnp.floor(py), jnp.floor(pz)
        u, v, w = px - fx, py - fy, pz - fz
        i = fx.astype(jnp.int32) & (PERLIN_N - 1)
        j = fy.astype(jnp.int32) & (PERLIN_N - 1)
        k = fz.astype(jnp.int32) & (PERLIN_N - 1)
        uu = u * u * (3.0 - 2.0 * u)
        vv = v * v * (3.0 - 2.0 * v)
        ww = w * w * (3.0 - 2.0 * w)

        def lut(slot, idx):
            """256-entry lookup = two half-table lane gathers + select."""
            low = idx < 128
            im = jnp.where(low, idx, idx - 128)
            a = jnp.take_along_axis(half(slot), im, axis=1)
            b = jnp.take_along_axis(half(slot + 1), im, axis=1)
            return jnp.where(low, a, b)

        # Lattice permutation reads (+0 via perm, +1 via the rolled copy —
        # the (i+1)&255 wraparound IS the block-circular roll).
        pv = []
        for axis, iv in ((0, i), (1, j), (2, k)):
            p0 = lut(axis * 2, iv).astype(jnp.int32)
            p1 = lut(6 + axis * 2, iv).astype(jnp.int32)
            pv.append((p0, p1))

        accum = jnp.zeros_like(px)
        for di in range(2):
            for dj in range(2):
                for dk in range(2):
                    gidx = pv[0][di] ^ pv[1][dj] ^ pv[2][dk]
                    gx = lut(12, gidx)
                    gy = lut(14, gidx)
                    gz = lut(16, gidx)
                    wgt = (
                        (di * uu + (1 - di) * (1.0 - uu))
                        * (dj * vv + (1 - dj) * (1.0 - vv))
                        * (dk * ww + (1 - dk) * (1.0 - ww))
                    )
                    accum = accum + wgt * (
                        gx * (u - di) + gy * (v - dj) + gz * (w - dk))
        out_ref[sl, :] = accum


def perlin_noise_tpu(scene, p: V3, *, block_rows: int = 64,
                     interpret: bool | None = None):
    """[B] Perlin noise for the scene's single perlin instance (pid 0),
    value-matching ops/shade.perlin_noise(scene, 0, p)."""
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    B = p.x.shape[0]
    lanes = 128 * block_rows
    pad = (-B) % lanes
    shape2 = ((B + pad) // 128, 128)
    to2d = lambda a: jnp.pad(a, (0, pad)).reshape(shape2)  # noqa: E731
    px, py, pz = to2d(p.x), to2d(p.y), to2d(p.z)
    tables = _pack_tables(scene)

    from another_raytracer_tpu.ops.pallas.bvh_kernel import lane_struct, match_vma

    (tables,) = match_vma(px, tables)
    lane_spec = pl.BlockSpec((block_rows, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec((_N_SLOTS * 8, 128), lambda g: (0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, rows=block_rows),
        grid_spec=pl.GridSpec(
            grid=(shape2[0] // block_rows,),
            in_specs=[tab_spec] + [lane_spec] * 3,
            out_specs=lane_spec,
        ),
        out_shape=lane_struct(shape2, jnp.float32, px),
        interpret=interpret,
    )(tables, px, py, pz)
    return out.reshape(-1)[:B]


# --------------------------------------------------------------------------
# Value-only evaluation inside DIFFERENTIATED computations
# --------------------------------------------------------------------------
# pallas_call has no autodiff rule, so even a stop_gradient'ed call fails
# jax's linearization ("failed to produce known values for all output
# primals") when it sits inside a value_and_grad region.  This custom_vjp
# wrapper gives the kernel an explicit zero-cotangent backward — correct
# for the noise_value_only class (shade.py): the caller guarantees the
# noise argument has no trainable dependence.

def _zero_cot(x):
    import numpy as _np

    if jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return jnp.zeros_like(x)
    return _np.zeros(_np.shape(x), jax.dtypes.float0)


@jax.custom_vjp
def perlin_noise_tpu_nograd(scene, p):
    return perlin_noise_tpu(scene, p)


def _nograd_fwd(scene, p):
    return perlin_noise_tpu(scene, p), (scene, p)


def _nograd_bwd(res, _ct):
    scene, p = res
    return jax.tree.map(_zero_cot, scene), jax.tree.map(_zero_cot, p)


perlin_noise_tpu_nograd.defvjp(_nograd_fwd, _nograd_bwd)
