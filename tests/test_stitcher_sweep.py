"""stitch_and_save_many sweep semantics with the grouped align path:
mixed input shapes force group flushes, a missing-file job is isolated
without stopping the sweep, and per-pair outputs match the one-shot
stitch_and_save (reference behavior: out.py's per-pair loop writes each
pair's files and a failure skips only that pair)."""

import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from stitchax.align.adapter import AlignConfig
from stitchax.run.stitcher import Stitcher
from stitchax.tps.pipeline import TPSConfig


class _Cfg(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def _write_pair(root, name, rng, H, W, shift=24):
    base = rng.uniform(40, 215, (H // 8, (W + shift) // 8, 3))
    scene = np.asarray(Image.fromarray(base.astype(np.uint8)).resize(
        (W + shift, H), Image.BILINEAR), np.uint8)
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    Image.fromarray(scene[:, :W]).save(os.path.join(d, "input1.jpg"))
    Image.fromarray(scene[:, shift:]).save(os.path.join(d, "input2.jpg"))
    return {"DATA_PATH": d, "IMG1": "input1.jpg", "IMG2": "input2.jpg"}


def _stitcher(shift=24, W=160):
    S = 512

    def homo_fn(a, b):
        dx = -shift * (S / W)
        off = jnp.array([[dx, 0, dx, 0, dx, 0, dx, 0]], jnp.float32)
        return jnp.broadcast_to(off, (a.shape[0], 8))

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    return Stitcher(None, _Cfg(swap_image=False),
                    AlignConfig(use_fb_consistency_mask=False,
                                canvas_bucket=64),
                    TPSConfig(grid_h=8, grid_w=8),
                    inpainter_name="cv_inpainter",
                    homo_fn=homo_fn, flow_fn=flow_fn)


def test_sweep_grouped_mixed_shapes_and_failure(tmp_path, rng):
    root = str(tmp_path)
    # two same-shape pairs (one grouped step), one different shape (forces
    # a flush), one job with a missing file (isolated failure)
    jobs = [
        (_write_pair(root, "a", rng, 128, 160), os.path.join(root, "out/a")),
        (_write_pair(root, "b", rng, 128, 160), os.path.join(root, "out/b")),
        ({"DATA_PATH": root, "IMG1": "missing.jpg", "IMG2": "missing.jpg"},
         os.path.join(root, "out/broken")),
        (_write_pair(root, "c", rng, 128, 224), os.path.join(root, "out/c")),
    ]
    st = _stitcher()
    results = st.stitch_and_save_many(jobs)

    errs = dict(results)
    assert len(results) == 4
    assert errs[os.path.join(root, "out/broken")] is not None
    for name in ("a", "b", "c"):
        rp = os.path.join(root, "out", name)
        assert errs[rp] is None
        assert os.path.exists(os.path.join(rp, "ave_fusion.jpg")), name
    assert not os.path.exists(os.path.join(root, "out/broken",
                                           "ave_fusion.jpg"))

    # grouped sweep output == one-shot output for a grouped pair
    one = os.path.join(root, "out/one")
    st2 = _stitcher()
    st2.stitch_and_save(jobs[0][0], one)
    a = np.asarray(Image.open(os.path.join(root, "out/a/ave_fusion.jpg")),
                   np.float32)
    b = np.asarray(Image.open(os.path.join(one, "ave_fusion.jpg")),
                   np.float32)
    np.testing.assert_array_equal(a, b)


def test_sweep_group_program_budget(rng):
    """An odd-length same-shape sweep compiles exactly TWO align model
    programs (batch align_batch for the full groups + batch 1 for the
    remainder) — never a per-remainder-size program (each distinct
    program costs ~5 min through the remote-compile tunnel)."""
    H, W, shift = 128, 160, 24
    base = rng.uniform(40, 215, (H, W + shift, 3)).astype(np.float32)
    pairs = [(base[:, :W] + i, base[:, shift:] + i) for i in range(5)]

    st = _stitcher()
    results = list(st.stitch_many(pairs, align_batch=2))
    assert len(results) == 5
    model_keys = {k for k in st.compile_events if k[0] == "model"}
    batches = sorted(k[2] for k in model_keys)
    assert batches == [1, 2], st.compile_events

    # per-pair path produces identical outputs for the remainder pair
    st2 = _stitcher()
    solo = st2.stitch(*pairs[4])
    np.testing.assert_array_equal(results[4]["ave_fusion"],
                                  solo["ave_fusion"])


def test_sweep_isolates_degenerate_homography(tmp_path, rng):
    """A pair whose predicted homography rank-collapses (all four corners
    map to one point -> non-finite H, non-finite canvas box) must fail in
    ISOLATION: the other pair of its align group still stitches. This is
    the system-level net behind tools/fuzz_geometry.py's observation that
    DLT legitimately returns non-finite H for degenerate quads."""
    import os

    root = str(tmp_path)
    good = _write_pair(root, "g", rng, 128, 160)
    # mark the bad pair with a near-white input1 (mean > 200): the stub
    # homography collapses corners exactly for marked samples
    bad_dir = os.path.join(root, "bad")
    os.makedirs(bad_dir, exist_ok=True)
    white = np.full((128, 160, 3), 250, np.uint8)
    Image.fromarray(white).save(os.path.join(bad_dir, "input1.jpg"))
    Image.fromarray(white).save(os.path.join(bad_dir, "input2.jpg"))
    bad = {"DATA_PATH": bad_dir, "IMG1": "input1.jpg", "IMG2": "input2.jpg"}

    S, W, shift = 512, 160, 24

    def homo_fn(a, b):
        dx = -shift * (S / W)
        normal = jnp.array([dx, 0, dx, 0, dx, 0, dx, 0], jnp.float32)
        # map every corner to (0, 0): offsets = -corner positions
        collapse = jnp.array([0, 0, -S, 0, 0, -S, -S, -S], jnp.float32)
        is_marked = (a.mean(axis=(1, 2, 3)) > 0.55)[:, None]  # a in [-1,1]
        return jnp.where(is_marked, collapse[None], normal[None])

    def flow_fn(a, b):
        zero = jnp.zeros(a.shape[:3] + (2,), a.dtype)
        return [zero], zero[:, ::8, ::8]

    st = Stitcher(None, _Cfg(swap_image=False),
                  AlignConfig(use_fb_consistency_mask=False,
                              canvas_bucket=64),
                  TPSConfig(grid_h=8, grid_w=8),
                  inpainter_name="cv_inpainter",
                  homo_fn=homo_fn, flow_fn=flow_fn)

    jobs = [(good, os.path.join(root, "out/g")),
            (bad, os.path.join(root, "out/bad"))]
    errs = dict(st.stitch_and_save_many(jobs, align_batch=2))
    assert errs[os.path.join(root, "out/g")] is None
    assert os.path.exists(os.path.join(root, "out/g", "ave_fusion.jpg"))
    assert errs[os.path.join(root, "out/bad")] is not None
    assert not os.path.exists(os.path.join(root, "out/bad",
                                           "ave_fusion.jpg"))
