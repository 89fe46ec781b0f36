"""Capture a jax.profiler trace of the Cornell bench step and summarize it.

Parses the xplane proto with tensorboard_plugin_profile to print per-HLO-op
time, grouped by op category — the ground truth for where the forward and
backward passes actually spend cycles (microbenchmarks here sit below the
~9 ms remote-dispatch floor and are uninformative).
"""

import glob
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from another_raytracer_tpu.grad import diff
from another_raytracer_tpu.models import library
from another_raytracer_tpu.ops import camera as camera_lib
from another_raytracer_tpu.ops import render as render_lib

W, H, SPP, DEPTH, SPASS = 360, 270, 16, 8, 1
LOGDIR = "/tmp/artpu_trace"


def capture():
    scene, cam_params = library.cornell_box()
    cam = camera_lib.make_camera(aspect_ratio=W / H, **cam_params)
    seed = jnp.uint32(0)
    params, _ = diff.split_params(scene)
    target = jnp.zeros((W * H, 3), jnp.float32)

    fwd = jax.jit(lambda s, c: render_lib.render_radiance(
        s, c, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
        max_depth=DEPTH, t_min=1e-3, differentiable=False))
    g = jax.jit(lambda p, s, c, t: jax.value_and_grad(diff.render_loss)(
        p, s, c, t, seed, width=W, height=H, spp=SPP, samples_per_pass=SPASS,
        max_depth=DEPTH, t_min=1e-3))

    # Compile outside the trace.
    jax.block_until_ready(fwd(scene, cam))
    jax.block_until_ready(g(params, scene, cam, target))

    jax.profiler.start_trace(LOGDIR)
    for _ in range(3):
        jax.block_until_ready(fwd(scene, cam))
    for _ in range(3):
        jax.block_until_ready(g(params, scene, cam, target))
    jax.profiler.stop_trace()
    print("trace captured to", LOGDIR)


def summarize(n_runs=3):
    """Parse the Chrome trace JSON: per-XLA-module leaf-op time, grouped by
    fusion-name category (the xplane proto isn't importable in this env)."""
    import gzip
    import json
    import re

    files = sorted(glob.glob(LOGDIR + "/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace.json.gz found under", LOGDIR)
        return
    tr = json.loads(gzip.open(files[-1]).read())
    events = tr["traceEvents"]
    tidname = {}
    dev_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e.get("args", {}).get("name", ""):
            dev_pid = e["pid"]
    for e in events:
        if e.get("ph") == "M" and e.get("pid") == dev_pid and e.get("name") == "thread_name":
            tidname[e["tid"]] = e["args"]["name"]
    mods = []
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == dev_pid \
                and tidname.get(e.get("tid")) == "XLA Modules":
            mods.append((e["ts"], e["ts"] + e["dur"], e["name"]))
    mods.sort()
    permod = defaultdict(lambda: defaultdict(float))
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid \
                or tidname.get(e.get("tid")) != "XLA Ops":
            continue
        if e["name"].startswith("while"):  # container op; children are separate
            continue
        for t0, t1, m in mods:
            if t0 <= e["ts"] < t1:
                base = re.sub(r"[.\d]+$", "", e["name"])
                permod[m][base] += e["dur"]
                break
    for m in sorted(permod, key=lambda m: sum(permod[m].values())):
        ops = permod[m]
        tot = sum(ops.values())
        print(f"== module {m[:60]} leaf-op time {tot/n_runs/1000:.2f} ms/run")
        for name, d in sorted(ops.items(), key=lambda kv: -kv[1])[:16]:
            print(f"   {d/n_runs/1000:8.3f} ms/run  {name[:90]}")


if __name__ == "__main__":
    if "--summarize-only" not in sys.argv:
        capture()
    summarize()


def summarize_ops(n_runs=3, top=24):
    """Like summarize, but per individual op name (no base-name grouping)."""
    import gzip
    import json

    files = sorted(glob.glob(LOGDIR + "/plugins/profile/*/*.trace.json.gz"))
    tr = json.loads(gzip.open(files[-1]).read())
    events = tr["traceEvents"]
    tidname = {}
    dev_pid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in e.get("args", {}).get("name", ""):
            dev_pid = e["pid"]
    for e in events:
        if e.get("ph") == "M" and e.get("pid") == dev_pid and e.get("name") == "thread_name":
            tidname[e["tid"]] = e["args"]["name"]
    per = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid \
                or tidname.get(e.get("tid")) != "XLA Ops":
            continue
        if e["name"].startswith("while"):
            continue
        per[e["name"]] += e["dur"]
        cnt[e["name"]] += 1
    for name, d in sorted(per.items(), key=lambda kv: -kv[1])[:top]:
        print(f"   {d/n_runs/1000:8.3f} ms/run x{cnt[name]//n_runs:4d}  {name[:110]}")
