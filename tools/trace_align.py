#!/usr/bin/env python
"""Attempt a jax.profiler device trace of the align step (VERDICT r4 #9).

The MFU table (results/mfu_table.md) rests on XLA cost_analysis byte
counts; a real device trace would turn "at/above the roofline" from
inference into measurement. This tool runs the bench align step under
jax.profiler.trace and then inspects whatever the relay transported:

  * if a trace.json.gz (chrome trace) appears, it prints the top device
    ops by total duration — the per-fusion accounting the verdict asked
    for;
  * if only host-side .xplane.pb files appear (or nothing), it records
    that the axon relay does not transport device traces, which is the
    documented-limitation arm of the verdict item.

Usage (TPU): python tools/trace_align.py [--iters 3] [--out /tmp/trace]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def summarize_chrome_trace(path, top=40):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # aggregate complete events (ph == "X") by name per pid group
    pids = {p.get("pid"): p.get("args", {}).get("name", str(p.get("pid")))
            for p in events if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid_name = pids.get(e.get("pid"), str(e.get("pid")))
        key = (pid_name, e.get("name", "?"))
        dur = float(e.get("dur", 0.0))
        tot, cnt = agg.get(key, (0.0, 0))
        agg[key] = (tot + dur, cnt + 1)
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    out = []
    for (pid_name, name), (tot, cnt) in rows:
        out.append(dict(stream=pid_name, op=name[:120],
                        total_ms=round(tot / 1000.0, 3), calls=cnt))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/trace_align")
    ap.add_argument("--summary_out",
                    default="results/trace_align_summary.json")
    args = ap.parse_args()

    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import (FlowFormer, FlowFormerConfig,
                                 UDIS2HomographyNet)
    from stitchax.utils.precision import bf16_apply

    B, S = 4, 512
    flow_model = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo_model = UDIS2HomographyNet()
    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    fp = jax.jit(flow_model.init)(k, img, img)
    hp = jax.jit(homo_model.init)(k, img, img)
    homo_fn = lambda a, b: bf16_apply(homo_model.apply, hp)(a, b)
    flow_fn = lambda a, b: bf16_apply(flow_model.apply, fp)(a, b)
    flow_pair_fn = lambda a, b: bf16_apply(
        lambda p, x, y: flow_model.apply(p, x, y,
                                         method=FlowFormer.bidirectional),
        fp)(a, b)
    cfg = AlignConfig()

    @jax.jit
    def step(i1, i2):
        out = stitch_model_step(homo_fn, flow_fn, i1, i2, cfg,
                                flow_pair_fn=flow_pair_fn)
        return out["flow"], out["H"], out["origin_occlusion_mask"]

    rng = np.random.default_rng(0)
    i1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    i2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    out = step(i1, i2)
    _ = float(out[0].sum())     # compile + settle

    os.makedirs(args.out, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = step(i1, i2)
        _ = float(out[0].sum())
    wall = time.perf_counter() - t0
    print(f"traced {args.iters} iters in {wall:.2f}s")

    files = sorted(glob.glob(os.path.join(args.out, "**", "*"),
                             recursive=True))
    files = [f for f in files if os.path.isfile(f)]
    for f in files:
        print(f"  {os.path.getsize(f):>10d}  {f}")

    traces = [f for f in files if f.endswith("trace.json.gz")]
    summary = dict(iters=args.iters, wall_s=round(wall, 2),
                   files=[{os.path.relpath(f, args.out):
                           os.path.getsize(f)} for f in files])
    if traces:
        rows = summarize_chrome_trace(traces[-1])
        summary["top_ops"] = rows
        dev_rows = [r for r in rows if "TPU" in r["stream"]
                    or "tpu" in r["stream"] or "/device" in r["stream"]]
        summary["has_device_stream"] = bool(dev_rows)
        for r in rows[:25]:
            print(f"{r['total_ms']:>10.3f} ms x{r['calls']:<5d} "
                  f"[{r['stream'][:30]}] {r['op']}")
        if not dev_rows:
            summary["verdict"] = (
                "trace transported but contains HOST streams only — the "
                "axon relay does not surface device-side op timelines")
    else:
        summary["verdict"] = (
            "no chrome trace produced through the axon relay — device "
            "tracing is unavailable in this environment (documented "
            "limitation arm of VERDICT r4 #9)")
        print(summary["verdict"])

    os.makedirs(os.path.dirname(args.summary_out), exist_ok=True)
    with open(args.summary_out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"wrote {args.summary_out}")


if __name__ == "__main__":
    main()
