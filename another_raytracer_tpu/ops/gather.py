"""Small-table lookups as one-hot matmuls.

TPU lowers a generic gather (``table[idx]`` with a [B] index vector) to a
scalar loop — roughly one element per cycle.  A path tracer does dozens of
table lookups per ray per bounce (material/texture/transform/primitive
tables), which measured as the dominant cost of the whole renderer (~0.4 ms
per gather at B=390k on v5e).

For a small table the TPU-native formulation is dense algebra instead:
    out[b] = sum_k onehot(idx[b], k) * table[k]
i.e. a [B,K] one-hot against a [K,C] column block — one small matmul on the
MXU replaces C scalar-loop gathers, and XLA CSEs the shared one-hot across
every lookup keyed on the same index vector.

``Lookup`` batches all columns of one index into a single dot; use
``plan()`` for a reusable one-hot.  Above ``MAX_ONEHOT_K`` (mesh-sized
tables) it falls back to real gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_ONEHOT_K = 512


class Lookup:
    """Batched lookups ``table_col[idx]`` sharing one one-hot matrix.

    idx: [B] integer array (assumed already clipped to [0, K)).
    K:   static table length.
    """

    def __init__(self, idx, K: int):
        self.idx = idx
        self.K = int(K)
        self.dense = 0 < self.K <= MAX_ONEHOT_K
        if self.dense:
            iota = jnp.arange(self.K, dtype=idx.dtype)
            self.onehot = (idx[:, None] == iota[None, :]).astype(jnp.float32)

    def __call__(self, *columns):
        """columns: 1D [K] arrays (any dtype).  Returns the gathered [B]
        arrays in the same order and dtypes (ints must be < 2^24)."""
        if not self.dense:
            return tuple(c[self.idx] for c in columns)
        stacked = jnp.stack(
            [c.astype(jnp.float32) for c in columns], axis=1
        )  # [K, C]
        # HIGHEST precision: the TPU MXU's default single-pass bf16 matmul
        # would round table values (e.g. 555 -> 556) — with an exact 0/1
        # one-hot the 3-pass decomposition reconstructs f32 exactly.
        out = jnp.dot(
            self.onehot, stacked, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return tuple(
            out[:, i].astype(c.dtype) for i, c in enumerate(columns)
        )

    def v3(self, arr2d):
        """[K,3] table -> V3 of gathered [B] columns."""
        from another_raytracer_tpu.ops.vec3 import V3

        x, y, z = self(arr2d[:, 0], arr2d[:, 1], arr2d[:, 2])
        return V3(x, y, z)
