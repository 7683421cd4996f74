"""PyTorch -> stitchax weight conversion.

The reference distributes torch checkpoints (final_ckpt for the
FlowHomoAdpater, epoch050_model.pth for composition, 400_Trans.pth for
TransRef — reference: out.py:18,72,85, inf_configs/*.py:65; SURVEY.md §5).
This module converts those state dicts into stitchax flax param trees.

Op-level conversions (torch-validated in tests/test_convert.py):
  * Conv2d (O, I, kH, kW)        -> HWIO kernel
  * depthwise Conv2d (O, 1, k, k) -> HWIO with feature_group_count
  * Linear (O, I)                 -> (I, O)
  * LayerNorm / GroupNorm weight/bias -> scale/bias
  * BatchNorm -> scale/bias + batch_stats mean/var
  * ConvTranspose2d (I, O, kH, kW) -> flipped HWIO kernel

Model-level maps implemented: UDIS2 homography backbone (incl. the
torchvision resnet50 stages) and the composition U-Net. FlowFormer/TransRef
state dicts use the same op rules; their full key maps land with the weight
releases (no checkpoints ship in this environment to validate against).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def strip_module_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop DataParallel's 'module.' prefix (reference: out.py:72)."""
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


# ------------------------- op-level conversions ------------------------------


def conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def depthwise_conv_kernel(w) -> np.ndarray:
    """torch depthwise Conv2d (O, 1, kH, kW) -> flax (kH, kW, 1, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def linear_kernel(w) -> np.ndarray:
    """torch Linear weight (O, I) -> flax (I, O)."""
    return _np(w).T


def conv_transpose_kernel(w) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose
    (kH, kW, I, O) with spatial flip (torch's transposed conv correlates
    with the flipped kernel relative to lax.conv_transpose)."""
    k = _np(w).transpose(2, 3, 0, 1)
    return k[::-1, ::-1]


def norm_params(prefix: str, sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[f"{prefix}.weight"]),
            "bias": _np(sd[f"{prefix}.bias"])}


def batchnorm(prefix: str, sd: Mapping[str, Any]):
    params = norm_params(prefix, sd)
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


# --------------------------- UDIS2 homography --------------------------------


def convert_resnet50_stages(sd: Mapping[str, Any], prefix1: str, prefix2: str
                            ):
    """torchvision resnet50 stages packed as the reference's two Sequentials
    (reference: Homography/network.py:103-118: stage1 = [conv1, bn1, relu,
    maxpool, layer1, layer2], stage2 = [layer3]) -> ResNet50Stages params."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["conv1"] = {"kernel": conv_kernel(sd[f"{prefix1}.0.weight"])}
    p, s = batchnorm(f"{prefix1}.1", sd)
    params["bn1"], stats["bn1"] = p, s

    # sequential indices: 4=layer1, 5=layer2 in stage1; 0=layer3 in stage2
    layer_srcs = [(f"{prefix1}.4", 3), (f"{prefix1}.5", 4), (f"{prefix2}.0", 6)]
    for li, (src, n_blocks) in enumerate(layer_srcs):
        for b in range(n_blocks):
            name = f"layer{li + 1}_block{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": conv_kernel(
                    sd[f"{src}.{b}.conv{ci}.weight"])}
                p, s = batchnorm(f"{src}.{b}.bn{ci}", sd)
                bp[f"bn{ci}"], bs[f"bn{ci}"] = p, s
            if f"{src}.{b}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": conv_kernel(
                    sd[f"{src}.{b}.downsample.0.weight"])}
                p, s = batchnorm(f"{src}.{b}.downsample.1", sd)
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_udis2_homography(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Full UDIS2Network(only_homo=True) state dict -> UDIS2HomographyNet
    variables {'params': ..., 'batch_stats': ...}."""
    sd = strip_module_prefix(sd)
    fe_params, fe_stats = convert_resnet50_stages(
        sd, "feature_extractor_stage1", "feature_extractor_stage2")

    # regression head: Sequential conv indices 0,2,5,7,10,12; fc 0,2,4
    # (reference: Homography/network.py:18-46); flax names conv{i}{a,b}/fc{j}
    head: Dict[str, Any] = {}
    conv_idx = [(0, "conv0a"), (2, "conv0b"), (5, "conv1a"), (7, "conv1b"),
                (10, "conv2a"), (12, "conv2b")]
    for i, name in conv_idx:
        head[name] = {"kernel": conv_kernel(
            sd[f"regressNet1_part1.{i}.weight"])}
    fc_idx = [(0, "fc1"), (2, "fc2"), (4, "fc3")]
    for i, name in fc_idx:
        head[name] = {"kernel": linear_kernel(sd[f"regressNet1_part2.{i}.weight"]),
                      "bias": _np(sd[f"regressNet1_part2.{i}.bias"])}

    return {"params": {"feature_extractor": fe_params, "regress1": head},
            "batch_stats": {"feature_extractor": fe_stats}}


# --------------------------- UDIS2 composition -------------------------------


def convert_composition(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Composition Network state dict -> CompositionNet params
    (reference: Composition/network.py:77-129: down1..down5 Sequentials of
    [maxpool?]conv/relu/conv/relu, up1..up4 with halfChanelConv + conv, out)."""
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {}

    # DownBlock holds its Sequential under '.layer'; the pool at index 0
    # shifts conv indices by 1 (reference: Composition/network.py:23-34)
    for i in range(1, 6):
        offset = 0 if i == 1 else 1
        params[f"down{i}"] = {
            "conv1": {"kernel": conv_kernel(
                sd[f"down{i}.layer.{offset}.weight"]),
                "bias": _np(sd[f"down{i}.layer.{offset}.bias"])},
            "conv2": {"kernel": conv_kernel(
                sd[f"down{i}.layer.{offset + 2}.weight"]),
                "bias": _np(sd[f"down{i}.layer.{offset + 2}.bias"])},
        }
    for i in range(1, 5):
        params[f"up{i}"] = {
            "half": {"kernel": conv_kernel(
                sd[f"up{i}.halfChanelConv.0.weight"]),
                "bias": _np(sd[f"up{i}.halfChanelConv.0.bias"])},
            "conv1": {"kernel": conv_kernel(sd[f"up{i}.conv.0.weight"]),
                      "bias": _np(sd[f"up{i}.conv.0.bias"])},
            "conv2": {"kernel": conv_kernel(sd[f"up{i}.conv.2.weight"]),
                      "bias": _np(sd[f"up{i}.conv.2.bias"])},
        }
    params["out"] = {"kernel": conv_kernel(sd["out.0.weight"]),
                     "bias": _np(sd["out.0.bias"])}
    return {"params": params}


# ------------------------------ entry point ----------------------------------


def convert_checkpoint(path: str, kind: str) -> Dict[str, Any]:
    """Load a torch checkpoint file and convert. kind: 'homography' |
    'composition'. Accepts raw state dicts or {'model': sd} wrappers
    (reference: out.py:72-75,100)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if kind == "homography":
        return convert_udis2_homography(sd)
    if kind == "composition":
        return convert_composition(sd)
    raise ValueError(f"unknown checkpoint kind {kind!r}")
