"""Scaling-efficiency harness: rays/s on 1..N devices (and multi-host).

BASELINE.md north star: >=80% rays/s scaling efficiency from 1 chip to 2
hosts.  This measures Cornell-box forward throughput (honest bounce-segment
count) on growing tile meshes and prints efficiency vs linear scaling from
the 1-device run.

Single host (N local devices — real chips, or CPU with
--xla_force_host_platform_device_count):
    python scripts/scaling_harness.py [--cpu N] [--width W --height H --spp S]

Two hosts (run on each host; same args plus the distributed ones):
    python scripts/scaling_harness.py --coordinator HOST0:1234 --nprocs 2 --pid {0,1}
Multi-host runs measure only the full global mesh (per-host device subsets
of a global mesh aren't addressable); compare against a recorded single-host
run of the same workload.
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", type=int, default=0,
                    help="force N virtual CPU devices (0 = use real backend)")
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--spass", type=int, default=1)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--nprocs", type=int, default=None)
    ap.add_argument("--pid", type=int, default=None)
    args = ap.parse_args()

    if args.cpu:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu}")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from another_raytracer_tpu.parallel import multihost

    if args.coordinator:
        multihost.initialize(args.coordinator, args.nprocs, args.pid)

    import jax.numpy as jnp
    import numpy as np

    from another_raytracer_tpu.models import library
    from another_raytracer_tpu.ops import camera as camera_lib
    from another_raytracer_tpu.parallel import sharding

    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(
        aspect_ratio=args.width / args.height, **cam_params)
    if args.coordinator:
        scene = jax.tree.map(np.asarray, scene)
        cam = jax.tree.map(np.asarray, cam)

    devices = jax.devices()
    n = len(devices)
    print(f"backend={jax.default_backend()} processes={jax.process_count()} "
          f"global_devices={n}")
    print(f"workload: cornell {args.width}x{args.height} spp={args.spp} "
          f"depth={args.depth}")

    def measure(mesh):
        f = lambda: sharding.render_radiance_sharded(  # noqa: E731
            scene, cam, jnp.uint32(0), mesh=mesh, width=args.width,
            height=args.height, spp=args.spp, samples_per_pass=args.spass,
            max_depth=args.depth, t_min=1e-3)
        acc, segs = jax.block_until_ready(f())  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            acc, segs = f()
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / args.reps
        segs = int(np.asarray(
            segs.addressable_data(0) if hasattr(segs, "addressable_data") else segs))
        return segs / dt / 1e6

    if args.coordinator:
        mesh = sharding.hybrid_mesh(n, 1)
        rate = measure(mesh)
        print(f"devices={n} (x{jax.process_count()} hosts)  {rate:9.2f} Mrays/s")
        print("compare vs a recorded single-host run for cross-host efficiency")
        return

    sizes = []
    k = 1
    while k <= n:
        sizes.append(k)
        k *= 2
    if sizes[-1] != n:
        sizes.append(n)

    base = None
    for k in sizes:
        mesh = sharding.hybrid_mesh(k, 1, devices=devices[:k])
        rate = measure(mesh)
        if base is None:
            base = rate
        eff = rate / (base * k)
        flag = "" if k == 1 else ("  OK (>=80%)" if eff >= 0.80 else "  BELOW TARGET")
        print(f"devices={k:3d}  {rate:9.2f} Mrays/s  efficiency={eff:6.1%}{flag}")


if __name__ == "__main__":
    main()
