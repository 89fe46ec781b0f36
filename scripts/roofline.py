"""Speed-of-light / roofline analysis of the Cornell fwd+bwd step
(round-2 VERDICT #3: nobody had computed what the step's ceiling IS, so
"fast enough" was unfalsifiable).

Method: compile exactly bench.py's step, pull XLA's own cost model numbers
(`compiled.cost_analysis()`: total FLOPs and bytes accessed), time the step,
and compare the achieved FLOP/s and B/s against the v5e chip ceilings:

    HBM bandwidth : 819 GB/s
    MXU f32       : ~49 TFLOP/s  (bf16 197; f32 multiplies via 3-pass)
    VPU f32       : ~ 4.9 TFLOP/s (8 lanes x 128 sublanes x 4 ALUs x 1.2e9)

The step is elementwise/VPU-heavy (path tracing is selects + FMAs over [B]
lanes; the only MXU work is the one-hot table lookups), so the relevant
ceilings are VPU FLOP/s and HBM B/s; the script prints achieved fractions
of all three and names the binding resource.

Run on the TPU: python scripts/roofline.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 1

HBM_BPS = 819e9
MXU_F32 = 49e12
VPU_F32 = 4.9e12


def _module_device_seconds(logdir):
    """Total XLA-module device span in the newest trace, in seconds."""
    import glob
    import gzip
    import json

    files = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    tr = json.loads(gzip.open(files[-1]).read())
    events = tr["traceEvents"]
    dev_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e.get("args", {}).get("name", ""):
            dev_pid = e["pid"]
    tidname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("pid") == dev_pid \
                and e.get("name") == "thread_name":
            tidname[e["tid"]] = e["args"]["name"]
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == dev_pid \
                and tidname.get(e.get("tid")) == "XLA Modules":
            total += e["dur"]
    return total / 1e6


def main():
    from another_raytracer_tpu.grad import diff
    from another_raytracer_tpu.models import library
    from another_raytracer_tpu.ops import camera as camera_lib

    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)

    step = jax.jit(
        lambda p, s, c, t, sd: jax.value_and_grad(diff.render_loss)(
            p, s, c, t, sd, width=W, height=H, spp=SPP,
            samples_per_pass=SPASS, max_depth=DEPTH, t_min=1e-3,
        )
    )
    lowered = step.lower(params, scene, cam, target, jnp.uint32(0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", float("nan"))
    bytes_acc = ca.get("bytes accessed", float("nan"))
    print(f"XLA cost model: {flops/1e9:.1f} GFLOP, "
          f"{bytes_acc/1e9:.2f} GB accessed per step")

    # DEVICE time from the profiler trace, not wall clock: on the remote
    # tunnel block_until_ready returns before the device work completes
    # (measured walls below 1 ms for steps whose device trace shows
    # ~10 ms — including 100 chained distinct-seed steps "completing" in
    # 20 ms total), so wall-clock here measures dispatch throughput.  The
    # XLA-module span in the device trace is the honest denominator.
    loss, grads = step(params, scene, cam, target, jnp.uint32(0))
    jax.block_until_ready(grads)
    reps = 3
    logdir = "/tmp/artpu_roofline_trace"
    jax.profiler.start_trace(logdir)
    for r in range(reps):
        loss, grads = step(params, scene, cam, target, jnp.uint32(r + 1))
    jax.block_until_ready(grads)
    time.sleep(1.0)
    jax.profiler.stop_trace()
    dt = _module_device_seconds(logdir) / reps
    print(f"measured: {dt*1000:.1f} ms/step")

    f_rate = flops / dt
    b_rate = bytes_acc / dt
    print(f"achieved: {f_rate/1e12:.2f} TFLOP/s, {b_rate/1e9:.1f} GB/s")
    print(f"  vs HBM   819 GB/s   : {b_rate/HBM_BPS:6.1%}")
    print(f"  vs MXU f32 49 TFLOP/s: {f_rate/MXU_F32:6.1%}")
    print(f"  vs VPU f32 4.9 TFLOP/s: {f_rate/VPU_F32:6.1%}")
    t_hbm = bytes_acc / HBM_BPS
    t_vpu = flops / VPU_F32
    print(f"lower bounds: HBM {t_hbm*1000:.1f} ms, VPU {t_vpu*1000:.1f} ms "
          f"-> binding: {'VPU' if t_vpu > t_hbm else 'HBM'} "
          f"(speed-of-light {max(t_hbm, t_vpu)*1000:.1f} ms, achieved "
          f"{max(t_hbm, t_vpu)/dt:.1%} of it)")


if __name__ == "__main__":
    main()
