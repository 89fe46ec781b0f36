"""Iterative wavefront path integrator (column-SoA state).

The reference integrator is the recursive ``_ray_color`` (engine.h:447-466):
  1. depth exhausted -> black;
  2. miss (t in [1e-3, inf)) -> background;
  3. add emitted;
  4. no scatter -> terminate with emitted;
  5. else emitted + attenuation * recurse(depth-1).

Recursion is untraceable on TPU; here the same contract is an iterative loop
carrying (origin, direction, time, throughput, radiance, alive) for a whole
ray batch in lockstep, with termination as masks.  Unrolling the recursion,
a path contributes ``sum_k (prod_{j<k} attenuation_j) * emitted_k`` plus
background weighted by the throughput at the miss bounce — exactly what the
masked accumulation computes.  No russian roulette and no light sampling,
matching the reference (SURVEY §2.2).

Every vector in the carry is a ``V3`` of [B] arrays — [B,3] arrays would pad
3->128 lanes in TPU loop-carry/residual buffers (see ops/vec3.py).

Two loop flavors:
  * ``lax.while_loop`` with an any-alive early exit for forward rendering
    (most rays die in a few bounces; the reference's max_depth=50 would cost
    50 full passes in a fixed scan);
  * ``lax.scan`` when differentiability is required (while_loop has no
    reverse-mode rule).  The closest-hit winner search runs entirely behind
    ``stop_gradient`` — backward only differentiates the [B]-sized winner
    recompute, so scan residuals stay small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from another_raytracer_tpu.ops import intersect, rng, shade, vec3
from another_raytracer_tpu.ops.vec3 import V3

# Trace-time knob for A/B benchmarking only (scripts/ab_fuse_rng.py): False
# restores the separate emitted()+scatter() calls (two material-table
# lookups + two texture evaluations per bounce).
FUSE_SHADE = True

# Trace-time A/B knob (scripts/ab_dead_lanes.py): zero dead lanes' ray
# directions before the winner search so they miss everything cheaply.
ZERO_DEAD_DIRS = True


def _media_uniforms(scene, pixel_ids, sample_ids, bounce, seed):
    """One uniform per (ray, medium) for free-flight sampling; lanes
    DIM_MEDIUM + 2*m keep media draws independent of everything else."""
    n_media = scene.n_media
    if not n_media:
        return jnp.zeros((pixel_ids.shape[0], 0), jnp.float32)
    cols = []
    for m in range(n_media):
        u, _ = rng.uniform2(seed, pixel_ids, sample_ids, bounce, rng.DIM_MEDIUM + 2 * m)
        cols.append(u)
    return jnp.stack(cols, axis=-1)


def _bounce(scene, carry, bounce, pixel_ids, sample_ids, seed, t_min, remat=False):
    """One wavefront bounce; returns the updated carry.

    ``remat``: rematerialize the shading stage (winner recompute + textures
    + scatter) in the backward pass.  The stage is a cheap pure function of
    (o, d, t, kind, idx), so checkpointing it shrinks the per-bounce scan
    residuals to roughly that tuple — profiling showed residual
    dynamic-update-slice stacking at ~28% of the fwd+bwd step.
    """
    o, d, time, throughput, radiance, alive, segments = carry

    u_media = _media_uniforms(scene, pixel_ids, sample_ids, bounce, seed)
    # Winner selection is a detached discrete decision: run the whole
    # [B, N] sweep (and any BVH traversal) outside the differentiation path —
    # backward only sees the per-ray winner recompute in make_hit_record,
    # which re-derives t differentiably from primitive parameters.
    sg = jax.lax.stop_gradient
    # Dead lanes keep their last ray in the lockstep carry; zero their
    # directions so they miss every primitive/AABB instead of dragging real
    # intersection work along.  For the packet-BVH kernel this is decisive:
    # a block's traversal follows the union of its lanes' needs, so stale
    # dead rays force full-tree walks (measured: the capsule mesh averages
    # 1.8 segments/primary — most lanes are dead most bounces).  Results for
    # dead lanes are discarded by the alive masks below either way.
    d_live = vec3.where(alive, d, V3.zeros(alive.shape)) if ZERO_DEAD_DIRS else d
    t, kind, idx = intersect.closest_hit(
        sg(scene), sg(o), sg(d_live), sg(time), u_media, t_min
    )
    hit = (kind >= 0) & alive

    # Miss -> background * throughput, then die (engine.h:455-457).
    miss_now = alive & ~hit
    bg = V3.from_array(scene.background)
    radiance = radiance + vec3.where(
        miss_now, throughput * bg, V3.zeros(miss_now.shape)
    )

    def shade_hit(scene, o, d, time, t, kind, idx, u_media):
        rec = intersect.make_hit_record(scene, o, d, time, t, kind, idx, u_media,
                                        t_min=t_min)
        # Emission accumulates for every live hit (engine.h:460-465); fused
        # with scatter so the material table and texture are read once.
        if FUSE_SHADE:
            emit, new_dir, attenuation, scatter_ok = shade.emit_and_scatter(
                scene, rec, d, pixel_ids, sample_ids, bounce, seed
            )
        else:
            emit = shade.emitted(scene, rec)
            new_dir, attenuation, scatter_ok = shade.scatter(
                scene, rec, d, pixel_ids, sample_ids, bounce, seed
            )
        return emit, rec.p, new_dir, attenuation, scatter_ok

    if remat:
        shade_hit = jax.checkpoint(shade_hit)
    emit, hit_p, new_dir, attenuation, scatter_ok = shade_hit(
        scene, o, d, time, t, kind, idx, u_media
    )

    live_hit = alive & hit
    radiance = radiance + vec3.where(live_hit, throughput * emit, V3.zeros(miss_now.shape))

    alive = live_hit & scatter_ok
    throughput = vec3.where(alive, throughput * attenuation, throughput)
    o = vec3.where(alive, hit_p, o)
    d = vec3.where(alive, new_dir, d)
    segments = segments + jnp.sum(alive.astype(jnp.int32))
    return (o, d, time, throughput, radiance, alive, segments)


def trace(scene, o: V3, d: V3, time, pixel_ids, sample_ids, seed, max_depth: int,
          t_min: float, differentiable: bool = False, remat: bool = False,
          unroll: "int | None" = None):
    """Trace a ray batch to completion.

    Returns (radiance V3 of [B], segments [] int32 — total alive ray
    segments summed over bounces, the honest bounce-ray count for rays/s
    metrics).

    ``remat``: rematerialize each bounce's shading stage in the backward
    pass instead of storing its residuals (trades a small recompute for
    per-bounce residual HBM traffic; only meaningful with
    ``differentiable=True``).
    """
    # Derive the initial carry from the ray *direction* rather than fresh
    # constants: under shard_map the loop carry must enter with the same
    # varying-axes type it exits with (check_vma=True).  d is always
    # pixel-derived hence device-varying; o can be a replicated constant
    # (lens-less camera origin) so it is bound to d's type too.  All of this
    # folds away in compilation.
    z = d.x * 0.0
    ones = z + 1.0
    alive = z < 1.0  # all-true, varying like d.x
    o = V3(o.x + z, o.y + z, o.z + z)
    carry = (
        o, d, time,
        V3(ones, ones, ones),
        V3(z, z, z),
        alive,
        jnp.sum(alive.astype(jnp.int32)),  # == B: primary segments all alive
    )

    if differentiable:
        # Default: fully unroll the bounce scan.  A rolled scan DUSes [1, B]
        # residual rows into [depth, B] buffers — an 8x write amplification
        # from (8, 128)-tile read-modify-write; unrolled, residuals are plain
        # values written once.  Measured (in-process, Cornell bench config):
        # fwd+bwd 34.7 ms rolled -> 26.6 ms fully unrolled.  The outer
        # sample-pass scan stays rolled (chunk_unroll=1 measured best).
        if unroll is None:
            unroll = max_depth

        def body(c, bounce):
            return _bounce(scene, c, bounce, pixel_ids, sample_ids, seed, t_min,
                           remat=remat), None
        carry, _ = jax.lax.scan(body, carry, jnp.arange(max_depth, dtype=jnp.uint32),
                                unroll=unroll)
    else:
        def cond(state):
            bounce, c = state
            return (bounce < max_depth) & jnp.any(c[5])

        def body(state):
            bounce, c = state
            c = _bounce(scene, c, bounce.astype(jnp.uint32), pixel_ids, sample_ids, seed, t_min)
            return (bounce + 1, c)

        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(0), carry))

    radiance, segments = carry[4], carry[6]
    return radiance, segments
