"""Demo-pair golden through the DEFAULT inference configuration.

tests/test_demo_golden.py pins the fast cv-inpainter path with the real
random-init models; this pins the path a reference user actually runs by
default — `--inf_cfg all_img1_with_inpaint_g12_transRef`
(reference inf_configs/all_img1_with_inpaint_g12_transRef.py): the
all_img1_with_inpaint mix with the TransRef inpainter composite, including
the transref-specific control-image branch where the img1-filled image is
passed as BOTH the inpainting input and the reference
(reference all_img1_with_inpaint.py:84-87, transref_inpainter.py:37-70).

Backbones are DETERMINISTIC STUBS (fixed corner offsets + an odd pointwise
flow), not random-init models: at random init the fb-consistency flows are
noise, the 19x19 double-open (ops.preprocess_occlusion_mask, reference
warp_utils.py occlusion open) erodes the occlusion mask to all-zero, and
img2 contributes NOTHING to the canvas — the golden would pin a degenerate
stitch in which the TransRef composite is multiplied away by an all-zero
tps_h_warp_mask (all_img1_with_inpaint.py:100). The stubs give a
well-conditioned homography with a real hole ring, so every stage the test
exists to pin — TPS break, hole algebra, mean-fill, TransRef forward, mask
composite, resize-back — executes on non-trivial content. _regen() refuses
to write a degenerate golden.

The TransRef weights here are the seed-0 random init (the reference
downloads 400_Trans.pth from Google Drive, absent in this environment);
what the golden pins is the full composite ORCHESTRATION per-pixel, not
trained quality. A second test pins the STITCHAX_TRANSREF_CKPT contract:
trained weights written by `tools/train_transref_learns.py --save_ckpt`
must actually flow into a default-constructed inpainter.

Regenerate after an INTENTIONAL semantics change with:
    python tests/test_demo_golden_transref.py --regen
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "demo1_seed0_transref.npz")
DEMO = os.path.join(os.path.dirname(__file__), "..", "demo_data", "demo1")

# the inpainter runs the transformer at a fixed square size; the reference
# uses 512 (transref_inpainter.py:50) — the test uses the model's minimum
# (256) so the CPU suite stays fast; the composite algebra is identical
TEST_INPAINT_SIZE = 256

class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _load_demo_pair(size=(224, 192)):
    from PIL import Image
    out = []
    for name in ("input1.jpg", "input2.jpg"):
        im = Image.open(os.path.join(DEMO, name)).convert("RGB")
        out.append(np.asarray(im.resize(size, Image.BILINEAR), np.float32))
    return out


from stub_backbones import stub_flow_fn as _flow_fn  # noqa: E402
from stub_backbones import stub_homo_fn as _homo_fn  # noqa: E402


def _build_transref_inpainter(ckpt=None):
    from stitchax.compose.inpainters import TransRefInpainter
    from stitchax.models.transref import make_default_transref_apply

    # never let a stray env var (or the committed-snapshot default
    # fallback) leak into the golden: ckpt="none" forces random init;
    # the env contract is pinned separately below
    os.environ.pop("STITCHAX_TRANSREF_CKPT", None)
    apply_fn = make_default_transref_apply(
        size=TEST_INPAINT_SIZE, seed=0, bf16=False, ckpt=ckpt or "none")
    return TransRefInpainter(apply_fn=apply_fn, size=TEST_INPAINT_SIZE)


def _stitch_demo():
    from stitchax.align.adapter import AlignConfig
    from stitchax.run.stitcher import Stitcher
    from stitchax.tps.pipeline import TPSConfig

    img1, img2 = _load_demo_pair()
    cfg = _Cfg(swap_image=False)
    st = Stitcher(None, cfg,
                  AlignConfig(model_size=128, canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="transref_inpainter",
                  mix_method="all_img1_with_inpaint",
                  homo_fn=_homo_fn, flow_fn=_flow_fn,
                  keep_inpaint_outputs=True)
    # swap in the reduced-size deterministic inpainter (the by-name default
    # is the reference's fixed 512; jit-cache keys carry inpainter_name, so
    # the override must happen before the first stitch)
    st.inpainter = _build_transref_inpainter()
    st.pack_mode = "rgb"   # goldens pin stitch semantics, not the pack
    return st.stitch(img1, img2)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(255.0 ** 2 / mse)


def test_demo1_default_config_matches_golden():
    assert os.path.isfile(GOLDEN), (
        "golden missing — run: python tests/test_demo_golden_transref.py "
        "--regen")
    want = np.load(GOLDEN)
    out = _stitch_demo()

    got_blend = np.clip(out["ave_fusion"], 0, 255).astype(np.uint8)
    assert got_blend.shape == want["ave_fusion"].shape, (
        f"canvas changed: {got_blend.shape} "
        f"vs {want['ave_fusion'].shape}")

    # non-degeneracy: img2 must actually contribute to the canvas and the
    # TransRef composite must survive the tps_h_warp_mask multiplication
    assert float(np.asarray(out["mask2"]).mean()) > 0.02
    assert float(np.abs(np.asarray(out["inpaint_img"])).mean()) > 1.0

    # the mix/composite images: inpaint_img is the TransRef composite
    # itself, ave_fusion the final mixed canvas (reference out.py:275)
    for key in ("ave_fusion", "inpaint_img", "warp2"):
        got = np.clip(out[key], 0, 255).astype(np.uint8)
        p = _psnr(got, want[key])
        assert p > 30.0, f"{key}: PSNR vs golden {p:.2f} dB"

    # the 5th mix return is the reference's 4-channel concat
    # (img1_filled RGB || inpaint_by_other mask, all_img1_with_inpaint.py:106)
    got_m = np.asarray(out["inpaint_area_mask"])[..., 3] > 0.5
    ref_m = want["inpaint_by_other"] > 127
    agree = float((got_m == ref_m).mean())
    assert agree > 0.99, f"inpaint_by_other agreement {agree:.4f}"
    # the ring must be non-empty for the inpainter to have been exercised
    assert ref_m.mean() > 0.005


def test_transref_ckpt_env_contract(tmp_path):
    """Weights from STITCHAX_TRANSREF_CKPT must reach the default-built
    apply closure (the Stitcher constructs inpainters by name only, so the
    env var is the production route for trained weights)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from stitchax.models.transref import make_default_transref_apply

    os.environ.pop("STITCHAX_TRANSREF_CKPT", None)
    base = make_default_transref_apply(size=TEST_INPAINT_SIZE, seed=0,
                                       bf16=False)

    # write a "trained" checkpoint = seed-1 init (any tree with the same
    # structure but different values)
    from stitchax.models.transref import TransRefBase
    model = TransRefBase()
    d = jnp.zeros((1, TEST_INPAINT_SIZE, TEST_INPAINT_SIZE, 3), jnp.float32)
    m = jnp.zeros((1, TEST_INPAINT_SIZE, TEST_INPAINT_SIZE, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), d, m, d)
    ckpt = tmp_path / "transref_ckpt.msgpack"
    ckpt.write_bytes(serialization.to_bytes(params))

    os.environ["STITCHAX_TRANSREF_CKPT"] = str(ckpt)
    try:
        loaded = make_default_transref_apply(size=TEST_INPAINT_SIZE, seed=0,
                                             bf16=False)
    finally:
        os.environ.pop("STITCHAX_TRANSREF_CKPT", None)

    k = jax.random.PRNGKey(2)
    detail = jax.random.uniform(k, (1, TEST_INPAINT_SIZE,
                                    TEST_INPAINT_SIZE, 3), minval=-1,
                                maxval=1)
    mask = (jax.random.uniform(jax.random.PRNGKey(3),
                               (1, TEST_INPAINT_SIZE, TEST_INPAINT_SIZE, 1))
            > 0.7).astype(jnp.float32)
    out_base = np.asarray(base(detail, mask, detail))
    out_loaded = np.asarray(loaded(detail, mask, detail))
    assert np.isfinite(out_loaded).all()
    diff = float(np.abs(out_base - out_loaded).max())
    assert diff > 1e-3, (
        "checkpoint from STITCHAX_TRANSREF_CKPT did not change the "
        f"default apply closure's output (max diff {diff})")


def test_transref_bf16_snapshot_restores_to_fp32(tmp_path):
    """A bf16 msgpack snapshot (the committed
    results/transref_ckpt_r04_bf16.msgpack format) must restore into the
    fp32 param template with the template's dtype and bf16-rounded values —
    the loader casts restored leaves to the template dtype so downstream
    compute paths (fp32 or bf16_apply) see a consistent tree."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from stitchax.models.transref import TransRefBase

    model = TransRefBase()
    d = jnp.zeros((1, TEST_INPAINT_SIZE, TEST_INPAINT_SIZE, 3), jnp.float32)
    m = jnp.zeros((1, TEST_INPAINT_SIZE, TEST_INPAINT_SIZE, 1), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(1), d, m, d)
    bf = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
    ckpt = tmp_path / "transref_ckpt_bf16.msgpack"
    ckpt.write_bytes(serialization.to_bytes(jax.device_get(bf)))

    restored = serialization.from_bytes(params, ckpt.read_bytes())
    cast = jax.tree_util.tree_map(
        lambda t, r: jnp.asarray(r, t.dtype), params, restored)
    leaves_t, leaves_c = (jax.tree_util.tree_leaves(params),
                          jax.tree_util.tree_leaves(cast))
    assert all(c.dtype == t.dtype for t, c in zip(leaves_t, leaves_c))
    # values are the bf16 rounding of the originals, not garbage
    for t, c in zip(leaves_t, leaves_c):
        np.testing.assert_allclose(
            np.asarray(c), np.asarray(t), rtol=8e-3, atol=1e-6)


def _regen():
    out = _stitch_demo()
    mask2_mean = float(np.asarray(out["mask2"]).mean())
    inpaint_mean = float(np.abs(np.asarray(out["inpaint_img"])).mean())
    ring = np.asarray(out["inpaint_area_mask"])[..., 3] > 0.5
    print(f"mask2 mean {mask2_mean:.4f}  inpaint_img absmean "
          f"{inpaint_mean:.2f}  ring frac {ring.mean():.4f}")
    if mask2_mean < 0.02 or inpaint_mean < 1.0 or ring.mean() < 0.005:
        raise SystemExit(
            "refusing to write a DEGENERATE golden: img2/inpaint content "
            "is (near-)zero — the TransRef composite would be unpinned")
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(
        GOLDEN,
        ave_fusion=np.clip(out["ave_fusion"], 0, 255).astype(np.uint8),
        warp2=np.clip(out["warp2"], 0, 255).astype(np.uint8),
        inpaint_img=np.clip(out["inpaint_img"], 0, 255).astype(np.uint8),
        inpaint_by_other=(ring * 255).astype(np.uint8),
    )
    print(f"wrote {GOLDEN}: blend {out['ave_fusion'].shape}")


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        _regen()
    else:
        print("use --regen to regenerate the golden")
