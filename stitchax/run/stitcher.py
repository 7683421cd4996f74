"""Per-pair stitching orchestration.

Rebuild of the reference's inference_one_data flow (reference:
out.py:158-312): align -> canvas render -> TPS breaking -> mix/inpaint ->
optional learned composition, writing the same output files per pair
(H_warp.jpg, flow_warp.jpg, warp1/2.jpg, mask1/2.jpg, ave_fusion.jpg,
composition.jpg, learned_mask1/2.jpg).

TPU-first structure: the reference swaps whole models between GPU and CPU
around every pair and round-trips through PIL/OpenCV for the TPS stage
(out.py:196-198,290-292); here every stage is a jitted function cached per
(input-shape, canvas-bucket), all models stay resident, and only image IO
touches the host.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import ops
from ..align.adapter import (AlignConfig, bucket_canvas, stitch_model_step,
                             stitch_render)
from ..compose.inpainters import get_inpainter
from ..models import (CompositionNet, FlowFormer, FlowFormerConfig,
                      UDIS2HomographyNet, compose_seam)
from ..tps.pipeline import TPSConfig, tps_break_warp
from ..utils.registry import MIX_METHODS


def load_pair_list(data_root_path: str, txt_file: str) -> List[Dict[str, str]]:
    """Pair manifest: one relative dir per line, each containing
    input1.jpg/input2.jpg (reference: out.py:106-127, demo/demo.txt)."""
    out = []
    with open(os.path.join(data_root_path, txt_file)) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            out.append({"DATA_PATH": os.path.join(data_root_path, line),
                        "IMG1": "input1.jpg", "IMG2": "input2.jpg"})
    return out


def load_image(path: str) -> np.ndarray:
    """RGB float32 (H, W, 3) in [0, 255] (reference loadSingleData,
    out.py:129-148, minus the BGR round-trip)."""
    from PIL import Image
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32)


def _np_scale_matrix(h: float, w: float) -> np.ndarray:
    return np.array(
        [[w / 2.0, 0.0, w / 2.0], [0.0, h / 2.0, h / 2.0], [0.0, 0.0, 1.0]],
        np.float32)


def host_translation_warp(img: np.ndarray, width_min: float,
                          height_min: float, out_h: int, out_w: int
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy replica of the device's translation-only canvas warp of img1
    (adapter.stitch_render: ops.homography_warp with I_mat = N⁻¹·T·M).

    warp1/mask1 are a pure translation of an image the HOST ALREADY HOLDS,
    so fetching them through the ~13 MB/s relay link wastes 4 of the packed
    17 uint8 channels per pair; this reproduces the exact op sequence in
    float32 instead. Returns (warp1 (out_h, out_w, 3) float32, mask1
    (out_h, out_w, 1) float32 in [0, 1]) at the BUCKETED canvas size,
    pre-quantization.
    """
    H, W, _ = img.shape
    f32 = np.float32
    T = np.eye(3, dtype=f32)
    T[0, 2] = f32(width_min)
    T[1, 2] = f32(height_min)
    theta = (np.linalg.inv(_np_scale_matrix(H, W)).astype(f32) @ T
             @ _np_scale_matrix(out_h, out_w)).astype(f32)
    return host_homography_warp(img, theta, out_h, out_w)


def host_homography_warp(img: np.ndarray, theta: np.ndarray,
                         out_h: int, out_w: int
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """Numpy replica of ops.homography_warp (+ a ones coverage mask): the
    UDIS2 spatial-transformer conventions — normalized linspace(-1,1,n)
    output grid, pixel map x=(s+1)·W/2 with W not W-1, and clamped-index
    "interior" weights that zero any sample whose floor falls outside
    [0, n-2] (reference: core/udis_utils/torch_homo_transform.py:17-112).
    Differences vs the device are float32 reassociation ulps (the device
    runs the same math fused by XLA), i.e. ≤1 uint8 LSB on pixels landing
    exactly on a rounding boundary.
    """
    H, W, _ = img.shape
    f32 = np.float32
    theta = np.asarray(theta, f32)
    gx = np.linspace(-1.0, 1.0, out_w, dtype=f32)
    gy = np.linspace(-1.0, 1.0, out_h, dtype=f32)
    gxx, gyy = np.meshgrid(gx, gy)
    g = np.stack([gxx, gyy, np.ones_like(gxx)], -1)
    Tg = (g @ theta.T).astype(f32)
    x_s, y_s, t_s = Tg[..., 0], Tg[..., 1], Tg[..., 2]
    t_s = t_s + f32(1e-6) * (1.0 - (np.abs(t_s) >= f32(1e-7)).astype(f32))
    x = ((x_s / t_s + 1.0) * (W / 2.0)).astype(f32)
    y = ((y_s / t_s + 1.0) * (H / 2.0)).astype(f32)

    x0 = np.floor(x)
    y0 = np.floor(y)
    fx, fy = x - x0, y - y0
    inx = ((x0 >= 0) & (x0 <= W - 2)).astype(f32)
    iny = ((y0 >= 0) & (y0 <= H - 2)).astype(f32)
    sx = np.clip(x0, 0, W - 2).astype(np.int64)
    sy = np.clip(y0, 0, H - 2).astype(np.int64)
    wx0, wx1 = ((1.0 - fx) * inx)[..., None], (fx * inx)[..., None]
    wy0, wy1 = ((1.0 - fy) * iny)[..., None], (fy * iny)[..., None]
    out = (img[sy, sx] * (wy0 * wx0) + img[sy, sx + 1] * (wy0 * wx1)
           + img[sy + 1, sx] * (wy1 * wx0)
           + img[sy + 1, sx + 1] * (wy1 * wx1)).astype(f32)
    mask = np.clip((wx0 + wx1) * (wy0 + wy1), 0.0, 1.0).astype(f32)
    return out, mask


def save_image(path: str, arr: np.ndarray):
    from PIL import Image
    a = np.clip(np.asarray(arr), 0, 255).astype(np.uint8)
    if a.ndim == 3 and a.shape[-1] == 1:
        a = a[..., 0]
    Image.fromarray(a).save(path)


@dataclass
class StitchModels:
    """Resident models + params. Random init keeps the pipeline runnable
    without converted checkpoints (the reference downloads its ckpts from
    Google Drive, README.md:8 — not available here)."""
    flow_model: FlowFormer
    flow_params: Any
    homo_model: UDIS2HomographyNet
    homo_params: Any
    comp_model: Optional[CompositionNet] = None
    comp_params: Any = None
    # bumped on every weight load; Stitcher keys its jit cache on it, so a
    # restore after the first stitch re-traces with the new params instead
    # of silently reusing stages with the old weights baked in
    version: int = 0

    @classmethod
    def build(cls, cfg, rng_seed: int = 0, use_composition: bool = True,
              init_size: int = 512):
        k = jax.random.PRNGKey(rng_seed)
        img = jnp.zeros((1, init_size, init_size, 3), jnp.float32)
        # inference consumes only the final prediction — skip the other 11
        # in-scan convex upsamples (param tree unchanged)
        ff_cfg = FlowFormerConfig(upsample_all=False)
        flow_model = FlowFormer(ff_cfg)
        homo_model = UDIS2HomographyNet()
        # jit the inits: eager init dispatches thousands of tiny ops, which
        # is pathological through the remote-TPU tunnel (~1 round-trip/op)
        flow_params = jax.jit(flow_model.init)(k, img, img)
        homo_params = jax.jit(homo_model.init)(k, img, img)
        comp_model = comp_params = None
        if use_composition:
            comp_model = CompositionNet()
            m = jnp.zeros((1, init_size, init_size, 1), jnp.float32)
            comp_params = jax.jit(comp_model.init)(k, img, img, m, m)
        models = cls(flow_model, flow_params, homo_model, homo_params,
                     comp_model, comp_params)
        if cfg.get("only_init_model", False):
            # reference init-ckpt path (out.py:69-75): separate pretrained
            # flow (things_*.pth) and homography (UDIS2 epoch100) checkpoints
            for key, kind in (("init_flow_ckpt", "flowformer"),
                              ("init_homo_ckpt", "homography")):
                path = cfg.get(key) or ""
                if path and os.path.isfile(path):
                    models.load_torch_init(path, kind)
                elif path:
                    print(f"[WARN] {key} {path!r} not found")
            return models
        ckpt = getattr(cfg, "restore_ckpt", None) or ""
        if ckpt and os.path.isdir(ckpt):
            models.restore(ckpt)                      # orbax directory
        elif ckpt and os.path.isfile(ckpt) and ckpt.endswith(".npz"):
            models.restore_npz(ckpt)                  # stitchax npz snapshot
        elif ckpt and os.path.isfile(ckpt):
            models.restore_torch(ckpt)                # reference final_ckpt
        elif ckpt:
            print(f"[WARN] checkpoint {ckpt!r} not found; using random init")
        return models

    def load_torch_init(self, path: str, kind: str):
        """Load one of the reference's init checkpoints (only_init_model)."""
        import jax.numpy as jnp
        from .. import convert
        variables = convert.convert_checkpoint(path, kind)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        if kind == "flowformer":
            self.flow_params = variables
        else:
            self.homo_params = variables
        self.version += 1
        print(f"[StitchModels] loaded {kind} init from {path}")

    def restore_torch(self, path: str):
        """Convert + load the reference's fused FlowHomoAdpater torch ckpt
        (final_ckpt: module.homo_backbone.* + module.flow_backbone.*)."""
        import torch
        from .. import convert
        import jax.numpy as jnp
        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        sd = convert.strip_module_prefix(sd)
        homo_sd = {k[len("homo_backbone."):]: v for k, v in sd.items()
                   if k.startswith("homo_backbone.")}
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        if homo_sd:
            self.homo_params = as_jnp(
                convert.convert_udis2_homography(homo_sd))
        if any(k.startswith("flow_backbone.") for k in sd):
            self.flow_params = as_jnp(convert.convert_flowformer(sd))
        self.version += 1
        print(f"[StitchModels] converted torch checkpoint {path}")

    def restore_npz(self, path: str):
        """Load a convert.save_params_npz snapshot ({flow, homo[, comp]}
        trees, bf16-stored) — the repo's durable container for trained-in-
        repo weights (e.g. results/ckpt_r04_bf16.npz)."""
        from .. import convert
        tpl = {"flow": self.flow_params, "homo": self.homo_params}
        if self.comp_params is not None and convert.npz_has_subtree(
                path, "comp"):
            tpl["comp"] = self.comp_params
        restored = convert.load_params_npz(path, tpl)
        self.flow_params = restored["flow"]
        self.homo_params = restored["homo"]
        if "comp" in restored:
            self.comp_params = restored["comp"]
        self.version += 1
        print(f"[StitchModels] loaded npz snapshot {path}")

    def restore(self, path: str):
        """Orbax restore of {flow, homo, comp} param trees."""
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        tpl = {"flow": self.flow_params, "homo": self.homo_params}
        if self.comp_params is not None:
            tpl["comp"] = self.comp_params
        restored = ckpt.restore(os.path.abspath(path), tpl)
        self.flow_params = restored["flow"]
        self.homo_params = restored["homo"]
        if self.comp_params is not None and "comp" in restored:
            self.comp_params = restored["comp"]
        self.version += 1

    def save(self, path: str):
        import orbax.checkpoint as ocp
        ckpt = ocp.StandardCheckpointer()
        tree = {"flow": self.flow_params, "homo": self.homo_params}
        if self.comp_params is not None:
            tree["comp"] = self.comp_params
        ckpt.save(os.path.abspath(path), tree, force=True)
        ckpt.wait_until_finished()


class Stitcher:
    """Stateful wrapper caching jitted stages per shape signature."""

    def __init__(self, models: Optional[StitchModels], cfg,
                 align_cfg: AlignConfig = AlignConfig(),
                 tps_cfg: TPSConfig = TPSConfig(),
                 inpainter_name: str = "cv_inpainter",
                 mix_method: str = "all_img1_with_inpaint",
                 homo_fn: Optional[Callable] = None,
                 flow_fn: Optional[Callable] = None,
                 input_bucket: int = 0,
                 keep_inpaint_outputs: bool = False,
                 host_reconstruct: bool = True):
        self.models = models
        self.cfg = cfg
        self.align_cfg = align_cfg
        self.tps_cfg = tps_cfg
        self.mix_method = mix_method
        self.mix_fn = MIX_METHODS.get(mix_method)
        self.inpainter_name = inpainter_name
        # lazy: get_inpainter("transref_inpainter") inits a full 512
        # TransRef, which must not be paid at construction time (callers
        # may override .inpainter — tests, custom sizes — and a sweep's
        # first TPS stage overlaps the init with earlier device work)
        self._inpainter = None
        self._step_cache: Dict[Tuple, Callable] = {}
        # input-resolution bucketing: round input dims up to a multiple of
        # `input_bucket` (0 = stitch at native res). A mixed-resolution
        # sweep otherwise compiles a fresh program set per distinct (H, W)
        # — pathological through the ~5-min-per-program remote-compile
        # tunnel. Generalizes the reference's own resize_to_512 model path
        # (core/flowHomoAdpater.py:203-205).
        self.input_bucket = int(input_bucket or 0)
        # opt-in fetch of the mix stage's inpaint intermediates
        # (inpaint_img / inpaint_area_mask). Off by default: the reference
        # never saves them (out.py:266-275) and the packed device->host
        # fetch is the per-pair bottleneck on the relay link — four extra
        # channels would tax every production stitch for debug-only data.
        self.keep_inpaint_outputs = bool(keep_inpaint_outputs)
        # host-side reconstruction of link-redundant outputs: warp1/mask1
        # are a translation-only warp of img1 (which the host already has),
        # H_warp is a homography warp of img2 (ditto, given the 9 floats of
        # H riding the box fetch), and ave_fusion is the closed-form blend
        # of packed outputs — so none of the four needs to cross the
        # ~13 MB/s relay: the packed fetch drops from 17 to 7 uint8
        # channels/pixel (59% fewer bytes on the per-pair bottleneck).
        # With the composition stage on, composition/learned_mask2 are
        # likewise compose_seam's closed form of packed lm1/warp2/mask2 +
        # the host's own warp1/mask1 (12 -> 8 channels) whenever the
        # composition ran at canvas resolution (no <512 upsize).
        # STITCHAX_FETCH_ALL=1 restores the full device fetch (debugging /
        # exact-device-value capture).
        self.host_reconstruct = bool(host_reconstruct) and (
            os.environ.get("STITCHAX_FETCH_ALL", "0") != "1")
        # image channels ride the pack as YUV 4:2:0 by default (1.5 ch/img
        # instead of 3 — the loss the JPEG save applies anyway, moved ahead
        # of the link; run/pack.py). STITCHAX_PACK=rgb restores exact.
        from .pack import pack_mode
        self.pack_mode = pack_mode()
        self.compile_events: List[Tuple] = []   # compile telemetry

        # homo_fn/flow_fn overrides support stub backbones in tests and
        # custom model families without subclassing
        # late-binding closures: params are read from self.models at trace
        # time; the jit cache keys include models.version (bumped on every
        # restore), so loading weights after the first stitch re-traces
        # automatically instead of reusing stages with old params baked in
        from ..models import FlowFormer as _FF
        from ..utils.precision import bf16_call
        if homo_fn is None:
            homo_fn = lambda a, b: bf16_call(
                self.models.homo_model.apply, self.models.homo_params, a, b)
        self._homo_fn = homo_fn
        self._flow_pair_fn = None
        if flow_fn is None:
            flow_fn = lambda a, b: bf16_call(
                self.models.flow_model.apply, self.models.flow_params, a, b)
            self._flow_pair_fn = lambda a, b: bf16_call(
                lambda p, x, y: self.models.flow_model.apply(
                    p, x, y, method=_FF.bidirectional),
                self.models.flow_params, a, b)
        self._flow_fn = flow_fn

    # ----------------------- cached jitted stages --------------------------

    @property
    def inpainter(self):
        if self._inpainter is None:
            self._inpainter = get_inpainter(self.inpainter_name)
        return self._inpainter

    @inpainter.setter
    def inpainter(self, value):
        self._inpainter = value

    def _params_version(self) -> int:
        return self.models.version if self.models is not None else 0

    def _log_compile(self, key):
        """Record + announce a jit-cache miss (each distinct program costs
        ~5 min through the remote-compile tunnel — see CLAUDE.md)."""
        self.compile_events.append(key)
        print(f"[Stitcher] compiling stage {key} "
              f"(total programs: {len(self.compile_events)})")

    def _model_step(self, shape, batch: int = 1):
        key = ("model", shape, batch, self._params_version())
        if key not in self._step_cache:
            self._log_compile(key)
            fn = lambda i1, i2: stitch_model_step(
                self._homo_fn, self._flow_fn, i1, i2, self.align_cfg,
                flow_pair_fn=self._flow_pair_fn)
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _render_step(self, shape, out_h, out_w):
        key = ("render", shape, out_h, out_w)
        if key not in self._step_cache:
            self._log_compile(key)
            fn = functools.partial(stitch_render, out_h=out_h, out_w=out_w,
                                   cfg=self.align_cfg)
            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _tps_step(self, shape, out_h, out_w):
        key = ("tps", shape, out_h, out_w, self.mix_method,
               self.inpainter_name)
        if key not in self._step_cache:
            self._log_compile(key)
            tps_cfg = self.tps_cfg
            mix_fn = self.mix_fn
            inpaint = self.inpainter.inpaint
            name = ("transref" if self.inpainter_name == "transref_inpainter"
                    else self.inpainter_name)

            def fn(output1, mask1, h_warp, h_warp_mask, final_warp,
                   residual_flow, width_min, height_min, occ, valid_flow):
                tps_out = tps_break_warp(
                    output1, mask1, h_warp, h_warp_mask, final_warp,
                    residual_flow, width_min, height_min, tps_cfg,
                    occlusion_mask=occ, valid_flow_mask=valid_flow)
                mixed = mix_fn(tps_out["output2"], tps_out["mask2"],
                               output1, mask1, final_warp, occ,
                               inpaint=inpaint, inpainter_name=name)
                output2 = mixed.tps_final_warp * mixed.tps_final_warp_mask
                mask2 = mixed.tps_final_warp_mask
                denom = jnp.maximum(mask1 + mask2, 1e-6)
                blend = jnp.clip(
                    (output1 * mask1 + output2 * mask2) / denom, 0, 255)
                return dict(tps_out, output2=output2, mask2=mask2,
                            new_blend_image=blend,
                            inpaint_img=mixed.inpaint_img,
                            inpaint_area_mask=mixed.inpaint_area_mask)

            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _composition_step(self, shape):
        key = ("comp", shape, self._params_version())
        if key not in self._step_cache:
            self._log_compile(key)
            from ..utils.precision import bf16_call

            def fn(o1, o2, m1, m2):
                n1 = jnp.clip(o1, 0, 255) / 127.5 - 1.0
                n2 = jnp.clip(o2, 0, 255) / 127.5 - 1.0
                out = bf16_call(self.models.comp_model.apply,
                                self.models.comp_params, n1, n2, m1, m2)
                return compose_seam(out, n1, n2, m1, m2)

            self._step_cache[key] = jax.jit(fn)
        return self._step_cache[key]

    def _pack_step(self, out_h, out_w, n_img, n_mask):
        """One jitted device-side encoder packing all canvas outputs into a
        single uint8 buffer: the remote-TPU relay moves ~13 MB/s with ~33 ms
        RTT (tools/exp_fetch.py), so fetching seven fp32 canvases one by one
        costs ~1.7 s/pair — 4x the actual device compute. uint8 is
        parity-exact for this pipeline (the reference materializes these
        same outputs as 8-bit JPEGs, out.py:290-308), and the default
        yuv420 mode additionally 2x2-subsamples image chroma — the loss
        the JPEG encoder applies anyway, moved ahead of the link
        (run/pack.py; STITCHAX_PACK=rgb restores the exact pack)."""
        from .pack import pack_canvas_uint8
        key = ("pack", out_h, out_w, n_img, n_mask, self.pack_mode)
        if key not in self._step_cache:
            self._log_compile(key)
            mode = self.pack_mode
            self._step_cache[key] = jax.jit(
                lambda imgs, masks: pack_canvas_uint8(imgs, masks, mode))
        return self._step_cache[key]

    # ------------------------------ pipeline -------------------------------

    def stitch(self, img1: np.ndarray, img2: np.ndarray) -> Dict[str, np.ndarray]:
        """Full stitch of one RGB pair ([0,255] float32 HWC). Returns numpy
        images cropped to the true canvas."""
        return self._stitch_finalize(self._stitch_device(img1, img2))

    def stitch_many(self, pairs, depth: int = 2, align_batch: int = 4):
        """Pipelined stitch over an iterable of (img1, img2): pair k's
        packed output streams to the host (copy_to_host_async) while the
        next pairs' device stages run, overlapping the relay transfer with
        the compute instead of serializing them. `depth` pairs stay in
        flight (transfer jitter on the relay is ±50%, so one pair of
        lookahead is not always enough to keep the link busy).

        Consecutive same-shape pairs additionally share ONE batched align
        model step per full `align_batch` group (the batch-4 default is the
        measured single-chip operating point — the same one bench.py's
        align metric uses; batch 8 plateaus on HBM pressure); remainder/
        odd-size groups dispatch
        pair-by-pair so compile cost stays bounded at two model programs
        per input shape (batch `align_batch` + batch 1) regardless of
        sweep composition. Yields one result dict per pair, in order."""
        from collections import deque
        pending = deque()
        group: List = []

        def flush():
            nonlocal group
            if len(group) == align_batch and align_batch > 1:
                states = self._stitch_device_group(group)
            else:
                states = [self._stitch_device(*g) for g in group]
            group = []
            return states

        for img1, img2 in pairs:
            img1, img2 = self._prep_pair_images(img1, img2)
            # group on BOTH shapes: one batched step stacks img1s and
            # img2s, so each must be uniform within a group
            if group and (img1.shape, img2.shape) != (
                    group[-1][0].shape, group[-1][1].shape):
                pending.extend(flush())
            group.append((img1, img2))
            if len(group) == align_batch:
                pending.extend(flush())
            while len(pending) > depth:
                yield self._stitch_finalize(pending.popleft())
        pending.extend(flush())
        while pending:
            yield self._stitch_finalize(pending.popleft())

    def _prep_pair_images(self, img1: np.ndarray, img2: np.ndarray):
        """Input-resolution bucketing (idempotent: bucketed dims map to
        themselves)."""
        if self.input_bucket:
            b = self.input_bucket
            H0, W0 = img1.shape[:2]
            Hb = max(-(-H0 // b) * b, b)
            Wb = max(-(-W0 // b) * b, b)
            if (Hb, Wb) != (H0, W0):
                from PIL import Image
                rs = lambda im: np.asarray(Image.fromarray(
                    np.clip(im, 0, 255).astype(np.uint8)).resize(
                    (Wb, Hb), Image.BILINEAR), np.float32)
                img1, img2 = rs(img1), rs(img2)
        return img1, img2

    def _stitch_device(self, img1: np.ndarray, img2: np.ndarray) -> Dict:
        return self._stitch_device_group([(img1, img2)])[0]

    def _stitch_device_group(self, pairs) -> List[Dict]:
        """Dispatch device stages for a group of same-shape pairs: ONE
        batched align model step, then per-pair canvas render / TPS /
        pack; host-blocks only on the single (G, 4) canvas-box fetch."""
        pairs = [self._prep_pair_images(i1, i2) for i1, i2 in pairs]
        H, W = pairs[0][0].shape[:2]
        s2 = pairs[0][1].shape
        assert all(p[0].shape[:2] == (H, W) and p[1].shape == s2
                   for p in pairs), \
            "grouped pairs must share one (bucketed) input shape"
        G = len(pairs)
        i1 = jnp.asarray(np.stack([p[0] for p in pairs]))
        i2 = jnp.asarray(np.stack([p[1] for p in pairs]))

        from ..utils.misc import stage
        with stage("align_model_step"):
            out = self._model_step((H, W), G)(i1, i2)

        # ONE batched host fetch for the canvas boxes: each float() is a
        # blocking round-trip through the remote-TPU relay (~100 ms), and
        # four of them serialized dominate the per-pair host path. The
        # (G, 3, 3) homographies ride the same fetch when the host will
        # reconstruct H_warp from them (9 floats/pair, link-free vs a
        # 3-channel canvas image).
        fetch = {}
        if "canvas_box" in out:
            fetch["box"] = out["canvas_box"]
        else:  # stub model steps in tests return separate scalars
            fetch["box4"] = [out["width_min"], out["height_min"],
                             out["width_max"], out["height_max"]]
        if self.host_reconstruct and "H" in out:
            fetch["H"] = out["H"]
        got = jax.device_get(fetch)
        box = (np.asarray(got["box"]) if "box" in got
               else np.asarray(got["box4"]).T).reshape(G, 4)
        H_host = np.asarray(got["H"], np.float32) if "H" in got else None

        oom = out.get("origin_occlusion_mask")
        scalar = lambda v, g: v[g] if getattr(v, "ndim", 0) else v
        states = []
        for g in range(G):
            out_g = {
                "H": out["H"][g:g + 1], "flow": out["flow"][g:g + 1],
                "origin_occlusion_mask":
                    None if oom is None else oom[g:g + 1],
                "width_min": scalar(out["width_min"], g),
                "height_min": scalar(out["height_min"], g),
            }
            states.append(self._render_pair_device(
                i1[g:g + 1], i2[g:g + 1], out_g, box[g],
                host_img1=pairs[g][0], host_img2=pairs[g][1],
                H_host=None if H_host is None else H_host[g]))
        return states

    def _render_pair_device(self, i1, i2, out, box, host_img1=None,
                            host_img2=None, H_host=None) -> Dict:
        """Canvas render + TPS + composition + uint8 pack for ONE pair
        ((1, H, W, 3) inputs, per-pair model-step outputs)."""
        a = self.align_cfg
        H, W = i1.shape[1], i1.shape[2]
        from ..utils.misc import stage
        width_min, height_min = float(box[0]), float(box[1])
        true_w = int(float(box[2]) - width_min)
        true_h = int(float(box[3]) - height_min)
        out_w = bucket_canvas(true_w, a.canvas_bucket, a.max_canvas)
        out_h = bucket_canvas(true_h, a.canvas_bucket, a.max_canvas)

        render = self._render_step((H, W), out_h, out_w)
        with stage("canvas_render"):
            r = render(i1, i2, out["H"], out["flow"],
                   out.get("origin_occlusion_mask"),
                   out["width_min"], out["height_min"])

        tps = self._tps_step((H, W), out_h, out_w)
        occ = r["occlusion_mask"]
        occ0 = (occ[0] if occ is not None
                else jnp.ones((out_h, out_w, 1), i1.dtype))
        # native-res fb-consistency mask as flow validity when configured
        # (reference: out.py:218-224 use_valid_on_flow)
        valid_flow = None
        if self.tps_cfg.use_valid_on_flow:
            ovm = out.get("origin_occlusion_mask")
            if ovm is not None:
                valid_flow = ovm[0]
        with stage("tps_break_mix"):
            t = tps(r["output1"][0], r["mask1"][0], r["H_warp"][0],
                r["H_warp_mask"][0], r["final_warp"][0], out["flow"][0],
                out["width_min"], out["height_min"], occ0, valid_flow)

        result = {
            "H_warp": r["H_warp"][0],
            "flow_warp": r["final_warp"][0],
            "warp1": r["output1"][0],
            "warp2": t["output2"],
            "mask1": r["mask1"][0],
            "mask2": t["mask2"],
            "ave_fusion": t["new_blend_image"],
            "width_min": width_min, "height_min": height_min,
            "out_h": true_h, "out_w": true_w,
        }
        if self.keep_inpaint_outputs:
            result["inpaint_img"] = t["inpaint_img"]
            result["inpaint_area_mask"] = t["inpaint_area_mask"]

        if self.models is not None and self.models.comp_model is not None:
            o1, o2 = result["warp1"][None], result["warp2"][None]
            m1, m2 = result["mask1"][None], result["mask2"][None]
            ch, cw = o1.shape[1], o1.shape[2]
            if min(ch, cw) < 512:  # reference resizes up (out.py:280-284)
                s = 512.0 / min(ch, cw)
                nh, nw = int(ch * s), int(cw * s)
                o1 = ops.resize_image_b(o1, nh, nw)
                o2 = ops.resize_image_b(o2, nh, nw)
                m1 = ops.resize_image_b(m1, nh, nw)
                m2 = ops.resize_image_b(m2, nh, nw)
            comp = self._composition_step(o1.shape[1:3])
            c = comp(o1, o2, m1, m2)
            result["composition"] = (
                (c["stitched_image"][0] + 1.0) * 127.5)
            # kept in [0,1]: the uint8 pack path classifies (H,W,1) arrays
            # as masks and packs them via clip(m,0,1)*255, which would
            # binarize a [0,255]-scaled soft mask at a 1/255 threshold;
            # _save_outputs rescales to [0,255] at write time
            result["learned_mask1"] = c["learned_mask1"][0]
            result["learned_mask2"] = c["learned_mask2"][0]

        # Device->host is the per-pair bottleneck (~13 MB/s relay,
        # tools/exp_fetch.py): pack every canvas-resolution output into ONE
        # uint8 buffer on device and start its transfer immediately; the
        # host-side split/crop happens in _stitch_finalize. uint8 is
        # parity-exact (these outputs are materialized as 8-bit JPEGs).
        canvas = lambda v: (isinstance(v, jnp.ndarray) and v.ndim == 3
                            and v.shape[:2] == (out_h, out_w))
        # warp1/mask1/ave_fusion never cross the link when the host can
        # rebuild them (host_translation_warp + the blend closed form);
        # H_warp likewise when the 3x3 H rode the box fetch
        # (host_homography_warp on img2, which the host also holds)
        recon = self.host_reconstruct and host_img1 is not None
        skip = {"warp1", "mask1", "ave_fusion"} if recon else set()
        if recon and host_img2 is not None and H_host is not None:
            skip.add("H_warp")
        # composition is the compose_seam closed form in [0,255] scale:
        # composition = warp1*lm1 + warp2*lm2 with lm2 = m1+m2-m1*m2-lm1,
        # so when the composition ran at canvas resolution (no <512 upsize,
        # out.py:280-284 rule) the host rebuilds it + learned_mask2 from
        # the packed lm1/warp2/mask2 and its own warp1/mask1: 4 fewer
        # channels on the per-pair link bottleneck (12 -> 8 with the
        # composition stage on)
        comp_recon = bool(
            recon and "composition" in result
            and result["composition"].shape[:2] == (out_h, out_w))
        if comp_recon:
            skip.update({"composition", "learned_mask2"})
        img_keys = [k for k, v in result.items()
                    if canvas(v) and v.shape[2] == 3 and k not in skip]
        mask_keys = [k for k, v in result.items()
                     if canvas(v) and v.shape[2] == 1 and k not in skip]
        pack = self._pack_step(out_h, out_w, len(img_keys), len(mask_keys))
        packed = pack([result[k] for k in img_keys],
                      [result[k] for k in mask_keys])
        # composition run at UPSIZED resolution (<512 canvas, out.py:280-284
        # rule) used to fall into the raw-float32 `other` fetch — larger
        # than the whole packed buffer on the ~13 MB/s relay (advisor r4
        # #2). It now rides a second uint8 pack at its own resolution.
        packed2 = None
        pack2_imgs, pack2_masks = [], []
        if "composition" in result and not comp_recon \
                and result["composition"].shape[:2] != (out_h, out_w):
            pack2_imgs = ["composition"]
            pack2_masks = ["learned_mask1", "learned_mask2"]
            uh, uw = result["composition"].shape[:2]
            pack2 = self._pack_step(uh, uw, 1, 2)
            packed2 = pack2([result["composition"]],
                            [result[k] for k in pack2_masks])
        other = [k for k, v in result.items()
                 if isinstance(v, jnp.ndarray) and v.ndim == 3
                 and k not in img_keys and k not in mask_keys
                 and k not in skip and k not in pack2_imgs
                 and k not in pack2_masks]
        for leaf in [packed] + [result[k] for k in other] + (
                [packed2] if packed2 is not None else []):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass
        return dict(result=result, packed=packed, img_keys=img_keys,
                    mask_keys=mask_keys, other=other, comp_recon=comp_recon,
                    packed2=packed2, pack2_imgs=pack2_imgs,
                    pack2_masks=pack2_masks, pack_mode=self.pack_mode,
                    dims=(out_h, out_w, true_h, true_w),
                    recon=((np.asarray(host_img1, np.float32),
                            width_min, height_min,
                            None if "H_warp" not in skip
                            else np.asarray(host_img2, np.float32),
                            H_host if "H_warp" in skip else None)
                           if recon else None))

    def _stitch_finalize(self, state: Dict) -> Dict[str, np.ndarray]:
        """Materialize a _stitch_device state on the host: one packed-uint8
        fetch split per key, cropped to the true canvas extent."""
        from .pack import unpack_canvas_uint8
        result = state["result"]
        img_keys, mask_keys = state["img_keys"], state["mask_keys"]
        out_h, out_w, true_h, true_w = state["dims"]
        mode = state.get("pack_mode", "rgb")
        np_result = dict(result)
        imgs, masks = unpack_canvas_uint8(
            np.asarray(state["packed"]), len(img_keys), len(mask_keys),
            mode, true_h, true_w)
        np_result.update(zip(img_keys, imgs))
        np_result.update(zip(mask_keys, masks))
        if state.get("packed2") is not None:
            p2 = np.asarray(state["packed2"])
            imgs2, masks2 = unpack_canvas_uint8(
                p2, len(state["pack2_imgs"]), len(state["pack2_masks"]),
                mode, p2.shape[0], p2.shape[1])
            np_result.update(zip(state["pack2_imgs"], imgs2))
            np_result.update(zip(state["pack2_masks"], masks2))
        other = state["other"]
        for k, arr in zip(other, jax.device_get([result[k] for k in other])
                          if other else []):
            if arr.shape[:2] == (out_h, out_w):
                arr = arr[:true_h, :true_w]
            np_result[k] = arr
        if state.get("recon") is not None:
            img1_np, wm, hm, img2_np, H_np = state["recon"]
            w1, m1 = host_translation_warp(img1_np, wm, hm, out_h, out_w)
            w1, m1 = w1[:true_h, :true_w], m1[:true_h, :true_w]
            o2, m2 = np_result["warp2"], np_result["mask2"]
            # the device blend formula verbatim (_tps_step), on the same
            # quantized o2/m2 the host received and the pre-quantization
            # w1/m1 the device used
            denom = np.maximum(m1 + m2, 1e-6)
            ave = np.clip((w1 * m1 + o2 * m2) / denom, 0, 255)
            np_result["warp1"] = np.rint(np.clip(w1, 0, 255)).astype(
                np.float32)
            np_result["mask1"] = np.rint(
                np.clip(m1, 0, 1) * 255.0).astype(np.float32) / 255.0
            np_result["ave_fusion"] = np.rint(ave).astype(np.float32)
            if H_np is not None and img2_np is not None:
                # H_canvas = N^-1 (H T) M, exactly as stitch_render builds
                # it (adapter.py: H @ translation, then conjugation)
                f32 = np.float32
                H2, W2, _ = img2_np.shape
                T = np.eye(3, dtype=f32)
                T[0, 2] = f32(wm)
                T[1, 2] = f32(hm)
                theta = (np.linalg.inv(_np_scale_matrix(H2, W2)).astype(f32)
                         @ (H_np @ T) @ _np_scale_matrix(out_h, out_w)
                         ).astype(f32)
                hw, _ = host_homography_warp(img2_np, theta, out_h, out_w)
                np_result["H_warp"] = np.rint(
                    np.clip(hw[:true_h, :true_w], 0, 255)).astype(np.float32)
            if state.get("comp_recon"):
                # compose_seam closed form on the packed lm1 and the same
                # w1/m1 the device used: composition = w1*lm1 + w2*lm2,
                # lm2 = m1 + m2 - m1*m2 - lm1 (models/udis2.py:184-191);
                # lm1's 1/255 pack quantization bounds the error at ~1
                # intensity level (pinned in test_stitcher_reconstruct.py)
                lm1 = np_result["learned_mask1"]
                lm2 = np.clip(m1 + m2 - m1 * m2 - lm1, 0.0, 1.0)
                comp = np.clip(w1 * lm1 + o2 * lm2, 0, 255)
                np_result["learned_mask2"] = lm2.astype(np.float32)
                np_result["composition"] = np.rint(comp).astype(np.float32)
        return np_result

    def _load_pair(self, data_dict: Dict[str, str]):
        img1 = load_image(os.path.join(data_dict["DATA_PATH"],
                                       data_dict["IMG1"]))
        img2 = load_image(os.path.join(data_dict["DATA_PATH"],
                                       data_dict["IMG2"]))
        if getattr(self.cfg, "resize_to_512", False):
            from PIL import Image
            rs = lambda a: np.asarray(Image.fromarray(
                a.astype(np.uint8)).resize((512, 512), Image.BILINEAR),
                np.float32)
            img1, img2 = rs(img1), rs(img2)
        if getattr(self.cfg, "swap_image", False):
            img1, img2 = img2, img1
        return img1, img2

    def stitch_and_save_many(self, jobs, align_batch: int = 4):
        """Pipelined sweep: jobs is an iterable of (data_dict, result_path).
        Pair k's output transfer + JPEG writes overlap pair k+1's device
        stages, and consecutive same-shape pairs share one batched align
        step (same scheme as stitch_many); one pair's failure is recorded
        and does not stop the sweep (a failed group retries its pairs
        individually). Returns [(result_path, error|None)]."""
        from collections import deque
        pending: deque = deque()
        results = []
        group: List = []   # (img1, img2, result_path)

        def finalize(item):
            state, rp, img1, img2, err = item
            if err is None:
                try:
                    out = self._stitch_finalize(state)
                    self._save_outputs(out, img1, img2, rp)
                except Exception as e:      # noqa: BLE001 — sweep resume
                    err = e
            results.append((rp, err))

        def dispatch_one(img1, img2, rp):
            try:
                return (self._stitch_device(img1, img2), rp, img1, img2,
                        None)
            except Exception as e:          # noqa: BLE001 — sweep resume
                return (None, rp, None, None, e)

        def flush():
            nonlocal group
            if not group:
                return
            # only full groups take the batched program: odd remainder
            # sizes would each compile another ~5-min model program
            if len(group) == align_batch and align_batch > 1:
                try:
                    states = self._stitch_device_group(
                        [(g[0], g[1]) for g in group])
                    pending.extend(
                        (st, rp, i1, i2, None)
                        for st, (i1, i2, rp) in zip(states, group))
                    group = []
                    return
                except Exception:           # noqa: BLE001 — isolate pairs
                    pass
            for i1, i2, rp in group:        # per-pair fallback
                pending.append(dispatch_one(i1, i2, rp))
            group = []

        for data_dict, result_path in jobs:
            try:
                img1, img2 = self._load_pair(data_dict)
                img1, img2 = self._prep_pair_images(img1, img2)
            except Exception as e:          # noqa: BLE001 — sweep resume
                flush()
                pending.append((None, result_path, None, None, e))
                continue
            if group and (img1.shape, img2.shape) != (
                    group[-1][0].shape, group[-1][1].shape):
                flush()
            group.append((img1, img2, result_path))
            if len(group) == align_batch:
                flush()
            while len(pending) > 2:
                finalize(pending.popleft())
        flush()
        while pending:
            finalize(pending.popleft())
        return results

    def stitch_and_save(self, data_dict: Dict[str, str], result_path: str):
        """One pair end to end, writing the reference's output files
        (reference: out.py:266-308)."""
        img1, img2 = self._load_pair(data_dict)
        out = self.stitch(img1, img2)
        self._save_outputs(out, img1, img2, result_path)
        return out

    def _save_outputs(self, out: Dict[str, np.ndarray], img1, img2,
                      result_path: str):
        os.makedirs(result_path, exist_ok=True)
        save_image(os.path.join(result_path, "input1.jpg"), img1)
        save_image(os.path.join(result_path, "input2.jpg"), img2)
        save_image(os.path.join(result_path, "H_warp.jpg"), out["H_warp"])
        save_image(os.path.join(result_path, "flow_warp.jpg"),
                   out["flow_warp"])
        save_image(os.path.join(result_path, "warp1.jpg"), out["warp1"])
        save_image(os.path.join(result_path, "warp2.jpg"), out["warp2"])
        save_image(os.path.join(result_path, "mask1.jpg"),
                   (out["mask1"] > 0.5) * 255.0)
        save_image(os.path.join(result_path, "mask2.jpg"),
                   (out["mask2"] > 0.5) * 255.0)
        save_image(os.path.join(result_path, "ave_fusion.jpg"),
                   out["ave_fusion"])
        if "composition" in out:
            save_image(os.path.join(result_path, "composition.jpg"),
                       out["composition"])
            save_image(os.path.join(result_path, "learned_mask1.jpg"),
                       out["learned_mask1"] * 255.0)
            save_image(os.path.join(result_path, "learned_mask2.jpg"),
                       out["learned_mask2"] * 255.0)
        return out
