"""Pallas packet-traversal BVH kernel (interpret mode) vs the XLA lockstep
traversal and the linear sweep."""

import numpy as np
import jax.numpy as jnp
import pytest

from another_raytracer_tpu.models import bvh as bvh_lib
from another_raytracer_tpu.ops.pallas import bvh_kernel
from another_raytracer_tpu.ops.vec3 import V3


def random_triangles(n, rng):
    base = rng.uniform(-5, 5, (n, 3))
    return (base,
            base + rng.uniform(-0.6, 0.6, (n, 3)),
            base + rng.uniform(-0.6, 0.6, (n, 3)))


@pytest.mark.parametrize("n_tris", [10, 300])
def test_kernel_matches_reference_traversal(n_tris):
    rng = np.random.default_rng(0)
    v0, v1, v2 = random_triangles(n_tris, rng)
    tree = bvh_lib.build(*bvh_lib.triangle_bounds(v0, v1, v2))
    nodes, tris = bvh_kernel.pack_bvh(tree, v0, v1, v2)

    B = 256
    o = V3.from_array(jnp.asarray(rng.uniform(-8, 8, (B, 3)), jnp.float32))
    d = V3.from_array(jnp.asarray(rng.normal(size=(B, 3)), jnp.float32))
    init_t = jnp.full((B,), 3e37, jnp.float32)
    init_i = jnp.zeros((B,), jnp.int32)

    t_k, code_k, hit_k = bvh_kernel.bvh_closest_hit(
        jnp.asarray(nodes), jnp.asarray(tris), o, d, init_t, init_i,
        block=128, interpret=True, leaf_size=bvh_lib.LEAF_SIZE,
    )
    i_k = np.asarray(code_k) >> 2  # rows carry id*4 + kind codes

    # Reference: brute-force in numpy (independent of both device paths).
    on = np.stack([np.asarray(c) for c in o], -1).astype(np.float64)
    dn = np.stack([np.asarray(c) for c in d], -1).astype(np.float64)
    best_t = np.full(B, np.inf)
    best_i = np.full(B, -1)
    for i in range(n_tris):
        n = np.cross(v1[i] - v0[i], v2[i] - v0[i])
        nd = dn @ n
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (np.dot(n, v0[i]) - on @ n) / nd
        p = on + t[:, None] * dn
        w0 = np.einsum("j,bj->b", n, np.cross(v1[i] - v0[i], p - v0[i]))
        w1 = np.einsum("j,bj->b", n, np.cross(v2[i] - v1[i], p - v1[i]))
        w2 = np.einsum("j,bj->b", n, np.cross(v0[i] - v2[i], p - v2[i]))
        ok = np.isfinite(t) & (t > 1e-3) & (t < best_t) & (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        best_t = np.where(ok, t, best_t)
        best_i = np.where(ok, i, best_i)

    hit_ref = best_i >= 0
    np.testing.assert_array_equal(np.asarray(hit_k), hit_ref)
    np.testing.assert_array_equal(np.asarray(i_k)[hit_ref], best_i[hit_ref])
    np.testing.assert_allclose(
        np.asarray(t_k)[hit_ref], best_t[hit_ref], rtol=2e-5
    )
