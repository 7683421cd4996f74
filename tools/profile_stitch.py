"""Synced per-stage breakdown of one full stitch (run on the TPU).

Times each Stitcher stage with forced host fetches, separating device time
from the host-sync/orchestration overhead the full-stitch bench includes.

Usage: PYTHONPATH=. python tools/profile_stitch.py
"""

import sys
import time

sys.path.insert(0, ".")
from stitchax.utils.platform import setup_cli_jax  # noqa: E402

setup_cli_jax()

import jax                       # noqa: E402
import jax.numpy as jnp          # noqa: E402
import numpy as np               # noqa: E402


def main():
    from stitchax.align.adapter import AlignConfig, bucket_canvas
    from stitchax.models import FlowFormer, FlowFormerConfig, UDIS2HomographyNet
    from stitchax.run.stitcher import StitchModels, Stitcher, load_image
    from stitchax.tps.pipeline import TPSConfig

    ff = FlowFormer(FlowFormerConfig(upsample_all=False))
    homo = UDIS2HomographyNet()
    k = jax.random.PRNGKey(0)
    img0 = jnp.zeros((1, 512, 512, 3), jnp.float32)
    fp = jax.jit(ff.init)(k, img0, img0)
    hp = jax.jit(homo.init)(k, img0, img0)
    models = StitchModels(ff, fp, homo, hp)
    st = Stitcher(models, {"swap_image": False}, AlignConfig(), TPSConfig(),
                  inpainter_name="cv_inpainter",
                  mix_method="all_img1_with_inpaint")

    img1 = load_image("demo_data/demo1/input1.jpg")
    img2 = load_image("demo_data/demo1/input2.jpg")
    st.stitch(img1, img2)  # compile

    def sync(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        _ = float(jnp.asarray(leaf).astype(jnp.float32).sum())

    a = st.align_cfg
    i1 = jnp.asarray(img1)[None]
    i2 = jnp.asarray(img2)[None]
    H, W = i1.shape[1:3]

    def timeit(name, fn, iters=5):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:32s} {dt * 1000:9.1f} ms", flush=True)
        return out

    step = st._model_step((H, W))
    out = timeit("align model step (b1)", lambda: step(i1, i2))

    # canvas bounds are per-pair (B,) arrays since the batched align step
    width_min = float(out["width_min"][0])
    height_min = float(out["height_min"][0])
    out_w = bucket_canvas(int(float(out["width_max"][0]) - width_min),
                          a.canvas_bucket, a.max_canvas)
    out_h = bucket_canvas(int(float(out["height_max"][0]) - height_min),
                          a.canvas_bucket, a.max_canvas)
    print(f"canvas bucket: {out_h}x{out_w}")

    render = st._render_step((H, W), out_h, out_w)
    wm0, hm0 = out["width_min"][0], out["height_min"][0]
    r = timeit("canvas render", lambda: render(
        i1, i2, out["H"], out["flow"], out.get("origin_occlusion_mask"),
        wm0, hm0))

    tps = st._tps_step((H, W), out_h, out_w)
    occ0 = r["occlusion_mask"][0]
    t = timeit("tps break + mix + inpaint", lambda: tps(
        r["output1"][0], r["mask1"][0], r["H_warp"][0], r["H_warp_mask"][0],
        r["final_warp"][0], out["flow"][0], wm0, hm0, occ0, None))

    # grouped align: one batched model step shared by 2 / 4 pairs
    step2 = st._model_step((H, W), 2)
    i1b = jnp.concatenate([i1, i1])
    i2b = jnp.concatenate([i2, i2])
    timeit("align model step (b2 = 2 pairs)", lambda: step2(i1b, i2b))
    step4 = st._model_step((H, W), 4)
    i1q = jnp.concatenate([i1] * 4)
    i2q = jnp.concatenate([i2] * 4)
    timeit("align model step (b4 = 4 pairs)", lambda: step4(i1q, i2q))

    # whole-pipeline host path for comparison
    t0 = time.perf_counter()
    for _ in range(5):
        st.stitch(img1, img2)
    dt = (time.perf_counter() - t0) / 5
    print(f"{'full stitch() host path':32s} {dt * 1000:9.1f} ms")

    # pipelined + grouped sweep (the stitch_many production path)
    list(st.stitch_many([(img1, img2)] * 4))  # compile the b2 program path
    t0 = time.perf_counter()
    n = sum(1 for _ in st.stitch_many([(img1, img2)] * 10))
    dt = (time.perf_counter() - t0) / n
    print(f"{'stitch_many per pair (grouped)':32s} {dt * 1000:9.1f} ms")


if __name__ == "__main__":
    main()
