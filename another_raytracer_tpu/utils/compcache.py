"""Persistent XLA compilation cache.

The reference pays its compile cost once at C++ build time; our analog of
"the binary is already built" is JAX's persistent compilation cache, which
serializes compiled TPU executables to disk keyed on (HLO, flags, backend).
Large scene programs here compile in 3-10 min on the remote chip (recorded:
sphere_ground 533.9 s, mesh_hd 670.6 s cold in BENCH_EXTRA.json), so a warm
cache is the difference between an interactive CLI and a coffee break.

Controlled by the ``ART_COMPILE_CACHE`` environment variable:

* unset / empty  -> cache enabled at the default location
  ``~/.cache/another_raytracer_tpu/jax`` (created on demand).
* ``0`` / ``off`` / ``none`` -> disabled.
* any other value -> used as the cache directory path.

Call :func:`enable` before the first jitted computation (bench.py, the CLI
and the perf scripts all do).  Safe to call multiple times.
"""

from __future__ import annotations

import os
from pathlib import Path

_DISABLED = {"0", "off", "none", "false"}


def enable(path: str | None = None) -> str | None:
    """Enable the persistent compilation cache; returns the dir or None.

    ``path`` overrides the ``ART_COMPILE_CACHE`` environment variable.
    """
    if path is None:
        path = os.environ.get("ART_COMPILE_CACHE", "")
    if path.strip().lower() in _DISABLED:
        return None
    if not path:
        path = str(Path.home() / ".cache" / "another_raytracer_tpu" / "jax")
    Path(path).mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that took noticeable compile time; the default 1 s
    # floor would already catch our programs, but the remote-tunnel dispatch
    # overhead (~9 ms/call) makes even small helper programs worth caching.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
