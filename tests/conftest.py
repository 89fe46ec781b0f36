"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding paths are validated on a virtual CPU mesh (the moral
equivalent of multi-node testing without a cluster, SURVEY §4d); single-chip
numerics tests also run on CPU for speed and f32 determinism.
"""

import os

# Must be set before jax initializes its backends.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-selects the axon TPU platform via
# jax.config at interpreter start (overriding JAX_PLATFORMS from the env);
# force CPU back explicitly so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) >= 8, jax.devices()
