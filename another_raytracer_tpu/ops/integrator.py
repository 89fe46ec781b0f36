"""Iterative wavefront path integrator.

The reference integrator is the recursive ``_ray_color`` (engine.h:447-466):
  1. depth exhausted -> black;
  2. miss (t in [1e-3, inf)) -> background;
  3. add emitted;
  4. no scatter -> terminate with emitted;
  5. else emitted + attenuation * recurse(depth-1).

Recursion is untraceable on TPU; here the same contract is an iterative loop
carrying (origin, direction, time, throughput, radiance, alive) for a whole
ray batch in lockstep, with termination as masks.  Radiance algebra:
unrolling the recursion, a path contributes
``sum_k (prod_{j<k} attenuation_j) * emitted_k`` plus background weighted by
the throughput at the miss bounce — exactly what the masked accumulation
below computes.  No russian roulette and no light sampling, matching the
reference (SURVEY §2.2).

Two loop flavors:
  * ``lax.while_loop`` with an any-alive early exit for forward rendering
    (most rays die in a few bounces; the reference's max_depth=50 would cost
    50 full passes in a fixed scan);
  * ``lax.scan`` when differentiability is required (while_loop has no
    reverse-mode rule).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from another_raytracer_tpu.ops import intersect, rng, shade


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


def _bounce(scene, carry, bounce, pixel_ids, sample_ids, seed, t_min):
    """One wavefront bounce; returns the updated carry."""
    o, d, time, throughput, radiance, alive, segments = carry

    u_media = _media_uniforms(scene, pixel_ids, sample_ids, bounce, seed)
    t, kind, idx = intersect.closest_hit(scene, o, d, time, u_media, t_min)
    hit = kind >= 0

    # Miss -> background * throughput, then die (engine.h:455-457).
    miss_now = alive & ~hit
    radiance = radiance + jnp.where(miss_now[:, None], throughput * scene.background, 0.0)

    rec = intersect.make_hit_record(scene, o, d, time, t, kind, idx)

    # Emission accumulates for every live hit (engine.h:460-465).
    emit = shade.emitted(scene, rec)
    live_hit = alive & hit
    radiance = radiance + jnp.where(live_hit[:, None], throughput * emit, 0.0)

    new_dir, attenuation, scatter_ok = shade.scatter(
        scene, rec, d, pixel_ids, sample_ids, bounce, seed
    )
    alive = live_hit & scatter_ok
    throughput = jnp.where(alive[:, None], throughput * attenuation, throughput)
    o = jnp.where(alive[:, None], rec.p, o)
    d = jnp.where(alive[:, None], new_dir, d)
    segments = segments + jnp.sum(alive.astype(jnp.int32))
    return (o, d, time, throughput, radiance, alive, segments)


def trace(scene, o, d, time, pixel_ids, sample_ids, seed, max_depth: int,
          t_min: float, differentiable: bool = False):
    """Trace a ray batch to completion.

    Args:
      scene: SceneData.
      o, d: [B,3] primary ray origins/directions.
      time: [B] ray times.
      pixel_ids, sample_ids: uint32 [B] RNG coordinates.
      seed: RNG seed.
      max_depth: bounce budget (reference default 50, tracer_constants.h:13).
      t_min: shadow-acne epsilon (1e-3, engine.h:455).
      differentiable: use a scan (reverse-mode differentiable) instead of a
        while_loop with early exit.

    Returns:
      (radiance [B,3], segments [] int32 — total alive ray segments summed
       over bounces, the honest bounce-ray count for rays/s metrics).
    """
    B = o.shape[0]
    carry = (
        o, d, time,
        jnp.ones((B, 3), o.dtype),
        jnp.zeros((B, 3), o.dtype),
        jnp.ones((B,), bool),
        jnp.asarray(B, jnp.int32),  # primary segments are all alive
    )

    if differentiable:
        def body(c, bounce):
            return _bounce(scene, c, bounce, pixel_ids, sample_ids, seed, t_min), None
        carry, _ = jax.lax.scan(body, carry, jnp.arange(max_depth, dtype=jnp.uint32))
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
