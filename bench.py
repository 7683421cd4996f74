"""Headline benchmark: full-stitch pairs/sec/chip (the BASELINE.md north
star), plus the align-step device throughput as an extra metric.

Full stitch = Stitcher.stitch on the demo pair resolution (384x448):
align (homo + FlowFormer fwd+bwd at 512² bf16) -> canvas render -> TPS
breaking -> mix with the classical inpainter, host syncs included —
exactly what `out.py` runs per pair, minus composition (weights-dependent)
and file IO. The align-step metric (512², batch 4) is kept for continuity
with round 1 (BENCH_r01: 12.6 pairs/s). Prints ONE JSON line.

Relay hardening (round 4): the remote-TPU relay tunnel
(/root/.tpu_init.py, localhost ports 8082-8117) can die and cannot be
restarted from inside the sandbox; a dead relay used to surface as a
backend-init stack trace (BENCH_r03.json rc=1). Now `python bench.py`
runs an orchestrator that (1) prechecks relay liveness with bounded
retries, (2) runs the actual measurement (`bench.py --measure`) in a
subprocess with a timeout so a half-dead relay's forever-blocking device
fetch cannot hang the driver, and (3) on any unrecoverable failure emits
ONE structured JSON diagnostic — rc 0, never a traceback — carrying the
last successfully measured numbers (results/last_bench.json) and the
current commit.

`vs_baseline` is value / REFERENCE_PAIRS_PER_SEC — a MEASURED same-host
anchor, conservative by construction. The reference publishes no numbers and
no CUDA GPU exists here (BASELINE.md), so the one like-for-like measurement
the environment permits is both implementations on the same host CPU:
`tools/bench_reference.py` timed the actual reference torch modules at a
median 31.9 s/pair for the ALIGN portion alone (1 UDIS2 homography + 2
FlowFormer forwards; BASELINE.md "Same-hardware reference comparison").
The reference's FULL stitch adds TPS/OpenCV/PIL and inpainting on top, so
0.0313 pairs/s is an UPPER bound on its same-host rate and the reported
ratio is a LOWER bound on the true speedup. Same-host CPU stitchax measures
~1.08x the reference (parity) — the ratio below is the TPU design's win,
not a recoding artifact.
"""

import json
import os
import subprocess
import sys
import time

# median reference-torch align s/pair on this host CPU (idle, 3 runs:
# 29.46/32.81/33.53 — tools/bench_reference.py, BASELINE.md), inverted;
# an upper bound on the reference's same-host full-stitch rate
REFERENCE_PAIRS_PER_SEC = 1.0 / 31.9

LAST_BENCH_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "results", "last_bench.json")


def _device_ms_per_pair(stitcher, img1, img2):
    """Synced device compute per pair (align b4 + render + TPS/mix) on the
    programs the sweep already compiled — link-independent, so a code
    regression is attributable through the relay's ±50% jitter (the
    full-stitch headline is link-state-bound; VERDICT r4 #5). Protocol =
    tools/profile_stitch.py: forced host fetch syncs, 5-iteration loops."""
    import jax
    import jax.numpy as jnp

    from stitchax.align.adapter import bucket_canvas

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        _ = float(jnp.asarray(leaf).astype(jnp.float32).sum())

    def timeit(fn, iters=5):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters, out

    a = stitcher.align_cfg
    i1 = jnp.asarray(img1, jnp.float32)[None]
    i2 = jnp.asarray(img2, jnp.float32)[None]
    H, W = i1.shape[1:3]

    step4 = stitcher._model_step((H, W), 4)
    i1q, i2q = jnp.concatenate([i1] * 4), jnp.concatenate([i2] * 4)
    align_dt, out = timeit(lambda: step4(i1q, i2q))

    wm0, hm0 = out["width_min"][0], out["height_min"][0]
    out_w = bucket_canvas(int(float(out["width_max"][0]) - float(wm0)),
                          a.canvas_bucket, a.max_canvas)
    out_h = bucket_canvas(int(float(out["height_max"][0]) - float(hm0)),
                          a.canvas_bucket, a.max_canvas)
    render = stitcher._render_step((H, W), out_h, out_w)
    render_dt, r = timeit(lambda: render(
        i1, i2, out["H"][:1], out["flow"][:1],
        out.get("origin_occlusion_mask")[:1]
        if out.get("origin_occlusion_mask") is not None else None,
        wm0, hm0))

    tps = stitcher._tps_step((H, W), out_h, out_w)
    tps_dt, _ = timeit(lambda: tps(
        r["output1"][0], r["mask1"][0], r["H_warp"][0], r["H_warp_mask"][0],
        r["final_warp"][0], out["flow"][0], wm0, hm0,
        r["occlusion_mask"][0], None))

    return {
        "device_ms_per_pair": round((align_dt / 4 + render_dt + tps_dt)
                                    * 1000, 2),
        "device_ms_align_b4_per_pair": round(align_dt / 4 * 1000, 2),
        "device_ms_render": round(render_dt * 1000, 2),
        "device_ms_tps_mix": round(tps_dt * 1000, 2),
    }


def bench_full_stitch(flow_model, flow_params, homo_model, homo_params):
    """Stitched pairs/sec through the real per-pair pipeline, plus the
    synced device-only stage breakdown."""
    import numpy as np
    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import StitchModels, Stitcher, load_image
    from stitchax.tps.pipeline import TPSConfig

    models = StitchModels(flow_model, flow_params, homo_model, homo_params)
    stitcher = Stitcher(models, {"swap_image": False},
                        AlignConfig(), TPSConfig(),
                        inpainter_name="cv_inpainter",
                        mix_method="all_img1_with_inpaint")

    img1 = load_image("demo_data/demo1/input1.jpg")
    img2 = load_image("demo_data/demo1/input2.jpg")

    stitcher.stitch(img1, img2)  # compile all stages for this shape
    # compile the grouped align program stitch_many uses, then settle the
    # tunnel after compile traffic
    list(stitcher.stitch_many([(img1, img2)] * 2))
    device_ms = _device_ms_per_pair(stitcher, img1, img2)
    # pipelined sweep throughput: stitch_many overlaps pair k's output
    # transfer with pair k+1's device stages — the sweep rate out.py
    # achieves. The relay link carries ±50% latency jitter and slow
    # recovery after compile traffic (BASELINE.md), so measure several
    # windows and report the MEDIAN: robust to one bad tunnel stall
    # without the upward bias a best-of would introduce (round ≤2
    # numbers were single 15-pair windows — comparable to the median,
    # not to a max).
    windows, iters = 3, 7
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        n = sum(1 for _ in stitcher.stitch_many([(img1, img2)] * iters))
        dt = time.perf_counter() - t0
        assert n == iters
        rates.append(iters / dt)
    return sorted(rates)[len(rates) // 2], device_ms


def measure():
    import jax
    from stitchax.utils.platform import setup_cli_jax
    setup_cli_jax()
    import jax.numpy as jnp

    from stitchax.align.adapter import AlignConfig, stitch_model_step
    from stitchax.models import FlowFormer, FlowFormerConfig, UDIS2HomographyNet

    backend = jax.default_backend()
    B, S = 4, 512  # batched serving point; eval protocol itself uses batch 12

    flow_model = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo_model = UDIS2HomographyNet()

    k = jax.random.PRNGKey(0)
    img = jnp.zeros((1, S, S, 3), jnp.float32)
    flow_params = jax.jit(flow_model.init)(k, img, img)
    homo_params = jax.jit(homo_model.init)(k, img, img)

    # bf16 backbones (reference runs mixed precision); geometry stays fp32
    from stitchax.models import FlowFormer as FF
    from stitchax.utils.precision import bf16_apply
    homo_fn = lambda a, b: bf16_apply(homo_model.apply, homo_params)(a, b)
    flow_fn = lambda a, b: bf16_apply(flow_model.apply, flow_params)(a, b)
    flow_pair_fn = lambda a, b: bf16_apply(
        lambda p, x, y: flow_model.apply(p, x, y,
                                         method=FF.bidirectional),
        flow_params)(a, b)
    cfg = AlignConfig()

    @jax.jit
    def step(img1, img2):
        out = stitch_model_step(homo_fn, flow_fn, img1, img2, cfg,
                                flow_pair_fn=flow_pair_fn)
        return out["flow"], out["H"], out["origin_occlusion_mask"]

    import numpy as np
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)
    img2 = jnp.asarray(rng.uniform(0, 255, (B, S, S, 3)), jnp.float32)

    # warmup/compile; sync via host fetch — block_until_ready is async
    # through the remote-TPU relay and enqueue backpressure overcounts
    # (CLAUDE.md benchmarking caveat)
    out = step(img1, img2)
    _ = float(out[0].sum())

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(img1, img2)
    _ = float(out[0].sum())  # device executes in order: syncs the chain
    dt = time.perf_counter() - t0

    align_pairs_per_sec = iters * B / dt

    stitch_pairs_per_sec, device_ms = bench_full_stitch(
        flow_model, flow_params, homo_model, homo_params)

    print(json.dumps({
        "metric": f"full_stitch_pairs_per_sec_per_chip_384x448 ({backend})",
        "value": round(stitch_pairs_per_sec, 4),
        "unit": "pairs/s",
        "vs_baseline": round(stitch_pairs_per_sec / REFERENCE_PAIRS_PER_SEC,
                             4),
        "extra": {
            f"align_pairs_per_sec_per_chip_512_b{B}":
                round(align_pairs_per_sec, 4),
            # link-independent device compute: the code-attributable number
            # (the headline rides the relay's ±50% link jitter)
            **device_ms,
            "vs_baseline_provenance":
                "value / 0.0313 pairs/s = measured same-host reference-"
                "torch align rate (tools/bench_reference.py, an upper "
                "bound on its full-stitch rate -> ratio is a lower bound)",
        },
    }))


# ---------------------------------------------------------------- orchestrator

def _git_commit():
    """Short HEAD hash read straight from .git (no subprocess)."""
    git = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".git")
    try:
        with open(os.path.join(git, "HEAD")) as f:
            head = f.read().strip()
        if head.startswith("ref: "):
            ref = head[5:]
            ref_path = os.path.join(git, *ref.split("/"))
            if os.path.exists(ref_path):
                with open(ref_path) as f:
                    return f.read().strip()[:7]
            with open(os.path.join(git, "packed-refs")) as f:
                for line in f:
                    if line.strip().endswith(ref):
                        return line.split()[0][:7]
            return None
        return head[:7]
    except OSError:
        return None


def _relay_alive(timeout=2.0):
    from stitchax.utils.platform import relay_alive
    return relay_alive(timeout)


def _last_measured():
    try:
        with open(LAST_BENCH_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def _emit_diagnostic(error, detail):
    """ONE parseable JSON line, rc 0 — never a stack trace (VERDICT r3 #1)."""
    last = _last_measured()
    print(json.dumps({
        "metric": "full_stitch_pairs_per_sec_per_chip_384x448 "
                  f"(NOT MEASURED: {error})",
        "value": 0.0,
        "unit": "pairs/s",
        "vs_baseline": 0.0,
        "error": error,
        "detail": detail,
        "last_measured": last,
        "commit": _git_commit(),
    }))


def orchestrate():
    # CPU platform override means the caller wants a local run — no relay.
    needs_relay = os.environ.get("STITCHAX_PLATFORM", "") in ("", "tpu",
                                                              "axon")
    if needs_relay:
        attempts, backoff = 3, 20.0
        for i in range(attempts):
            if _relay_alive():
                break
            if i < attempts - 1:
                time.sleep(backoff)
        else:
            _emit_diagnostic(
                "tpu_relay_dead",
                "no listener on relay ports 8082-8092 after "
                f"{attempts} checks over {backoff * (attempts - 1):.0f}s; "
                "the tunnel (/root/.tpu_init.py) cannot be restarted from "
                "inside the sandbox (CLAUDE.md)")
            return

    # Fresh compiles through the degraded remote-compile service can take
    # 20-40 min (CLAUDE.md); a warm /tmp/stitchax_jax_cache run takes ~2 min.
    budget = float(os.environ.get("STITCHAX_BENCH_TIMEOUT", "2700"))
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    try:
        out, _ = proc.communicate(timeout=budget)
    except subprocess.TimeoutExpired:
        # SIGTERM and wait — never SIGKILL a process holding the TPU claim
        # (CLAUDE.md: a kill -9 wedges all TPU work for ~30 min).
        proc.terminate()
        try:
            proc.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            pass  # leave it to die on its own rather than kill -9
        _emit_diagnostic("bench_timeout",
                         f"measurement subprocess exceeded {budget:.0f}s "
                         "(degraded remote-compile or half-dead relay)")
        return

    result = None
    for line in reversed(out.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
                break
            except json.JSONDecodeError:
                continue

    if proc.returncode == 0 and result is not None and "value" in result:
        print(json.dumps(result))
        try:  # record for the next diagnostic; best-effort
            os.makedirs(os.path.dirname(LAST_BENCH_PATH), exist_ok=True)
            with open(LAST_BENCH_PATH, "w") as f:
                json.dump({**result, "commit": _git_commit(),
                           "measured_at": time.strftime("%Y-%m-%d %H:%M")},
                          f, indent=1)
        except OSError:
            pass
        return

    tail = "\n".join(out.splitlines()[-15:])[-2000:]
    _emit_diagnostic("bench_failed",
                     f"measurement subprocess rc={proc.returncode}; "
                     f"tail: {tail}")


if __name__ == "__main__":
    if "--measure" in sys.argv[1:]:
        measure()
    else:
        orchestrate()
