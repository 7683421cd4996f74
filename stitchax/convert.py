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
torchvision resnet50 stages), the composition U-Net, and the full FlowFormer
(twins encoders + cost perceiver + memory decoder) and TransRef
(Tenc/RefPA/Tdec/convtail incl. non-local BN folding) — all structure-tested
against the reference layouts.
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


def conv_transpose_kernel_op(w) -> np.ndarray:
    """torch ConvTranspose2d with output_padding: same kernel transform as
    conv_transpose_kernel; the output_padding moves into the flax padding
    ((k-1-p, k-1-p+op), ...) — validated exact in tests."""
    return conv_transpose_kernel(w)


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
    'composition' | 'flowformer'. Accepts raw state dicts or {'model': sd}
    wrappers (reference: out.py:72-75,100)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt) if isinstance(ckpt, dict) else ckpt
    if kind == "homography":
        return convert_udis2_homography(sd)
    if kind == "composition":
        return convert_composition(sd)
    if kind == "flowformer":
        return convert_flowformer(sd)
    if kind == "transref":
        return convert_transref(sd.get("net", sd) if isinstance(sd, dict)
                                else sd)
    raise ValueError(f"unknown checkpoint kind {kind!r}")


# ------------------------------ FlowFormer -----------------------------------


def _lin(sd, prefix):
    p = {"kernel": linear_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def _convp(sd, prefix):
    p = {"kernel": conv_kernel(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = _np(sd[f"{prefix}.bias"])
    return p


def convert_twins_svt(sd: Mapping[str, Any], prefix: str,
                      depths=(2, 2)) -> Dict[str, Any]:
    """timm twins_svt_large stages 1-2 (stages 3-4 deleted by the reference,
    encoders.py:12-19) -> stitchax TwinsSVT params. Layout: patch_embeds.N,
    blocks.N.M (LSA fused qkv on even M, GSA q/kv/sr/norm on odd M),
    pos_block.N.proj.0 depthwise conv.

    The reference wraps the timm model as `self.svt` (encoders.py:10), so
    real checkpoints nest the keys one level deeper
    (`context_encoder.svt.patch_embeds...`) — detected here; flat layouts
    are accepted too (activation-parity coverage:
    tests/test_parity_twins.py)."""
    if f"{prefix}.svt.patch_embeds.0.proj.weight" in sd:
        prefix = f"{prefix}.svt"
    out: Dict[str, Any] = {}
    for s in range(len(depths)):
        out[f"patch_embed{s}"] = {
            "proj": _convp(sd, f"{prefix}.patch_embeds.{s}.proj"),
            "norm": norm_params(f"{prefix}.patch_embeds.{s}.norm", sd),
        }
        out[f"pos_block{s}"] = {
            "proj": _convp(sd, f"{prefix}.pos_block.{s}.proj.0")}
        for j in range(depths[s]):
            b = f"{prefix}.blocks.{s}.{j}"
            attn = {"proj": _lin(sd, f"{b}.attn.proj")}
            if j % 2 == 0:  # LSA: fused qkv
                attn["qkv"] = _lin(sd, f"{b}.attn.qkv")
            else:           # GSA
                attn["q"] = _lin(sd, f"{b}.attn.q")
                attn["kv"] = _lin(sd, f"{b}.attn.kv")
                attn["sr"] = _convp(sd, f"{b}.attn.sr")
                attn["norm"] = norm_params(f"{b}.attn.norm", sd)
            out[f"block{s}_{j}"] = {
                "norm1": norm_params(f"{b}.norm1", sd),
                "norm2": norm_params(f"{b}.norm2", sd),
                "attn": attn,
                "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                        "fc2": _lin(sd, f"{b}.mlp.fc2")},
            }
    return out


def _attention_layer(sd, p, with_kv=True):
    """SelfAttentionLayer / CrossAttentionLayer / input_layer fields
    (reference: encoder.py:127-172, decoder.py:30-109; ffn Sequential has
    Linear at indices 0 and 3)."""
    out = {
        "norm1": norm_params(f"{p}.norm1", sd),
        "norm2": norm_params(f"{p}.norm2", sd),
        "q": _lin(sd, f"{p}.q"),
        "proj": _lin(sd, f"{p}.proj"),
        "ffn": {"fc1": _lin(sd, f"{p}.ffn.0"), "fc2": _lin(sd, f"{p}.ffn.3")},
    }
    if with_kv:
        out["k"] = _lin(sd, f"{p}.k")
        out["v"] = _lin(sd, f"{p}.v")
    return out


def _rpe_context_block(sd, p, is_global: bool):
    """Twins RPE+context Block (reference: twins.py:229-392,752-790)."""
    a = f"{p}.attn"
    attn = {
        "context_proj": _lin(sd, f"{a}.context_proj"),
        "q": _lin(sd, f"{a}.q"),
        "k": _lin(sd, f"{a}.k"),
        "v": _lin(sd, f"{a}.v"),
        "proj": _lin(sd, f"{a}.proj"),
    }
    if is_global:
        attn["sr_key"] = _convp(sd, f"{a}.sr_key")
        attn["sr_value"] = _convp(sd, f"{a}.sr_value")
        attn["norm"] = norm_params(f"{a}.norm", sd)
    return {
        "norm1": norm_params(f"{p}.norm1", sd),
        "norm2": norm_params(f"{p}.norm2", sd),
        "attn": attn,
        "mlp": {"fc1": _lin(sd, f"{p}.mlp.fc1"),
                "fc2": _lin(sd, f"{p}.mlp.fc2")},
    }


def convert_cost_perceiver(sd: Mapping[str, Any], cpe: str,
                           encoder_depth: int = 3) -> Dict[str, Any]:
    """CostPerceiverEncoder subtree (reference: encoder.py:174-287):
    patch_embed ('single' ModuleList conv/relu/conv/relu/conv at .0/.2/.4,
    ffn_with_coord Sequential at .0/.2), latent tokens, input cross-attn,
    encoder_depth x (self-attn + vertical twins RPE-context pair)."""
    cp: Dict[str, Any] = {
        "latent_tokens": _np(sd[f"{cpe}.latent_tokens"]),
        "patch_embed": {
            "proj0": _convp(sd, f"{cpe}.patch_embed.proj.0"),
            "proj1": _convp(sd, f"{cpe}.patch_embed.proj.2"),
            "proj2": _convp(sd, f"{cpe}.patch_embed.proj.4"),
            "ffn1": _convp(sd, f"{cpe}.patch_embed.ffn_with_coord.0"),
            "ffn2": _convp(sd, f"{cpe}.patch_embed.ffn_with_coord.2"),
            "norm": norm_params(f"{cpe}.patch_embed.norm", sd),
        },
        "input_layer": _attention_layer(sd, f"{cpe}.input_layer"),
    }
    for i in range(encoder_depth):
        cp[f"encoder_layer{i}"] = _attention_layer(
            sd, f"{cpe}.encoder_layers.{i}")
        v = f"{cpe}.vertical_encoder_layers.{i}"
        cp[f"vertical_layer{i}"] = {
            "local_block": _rpe_context_block(sd, f"{v}.local_block", False),
            "global_block": _rpe_context_block(sd, f"{v}.global_block", True),
        }
    return cp


def convert_flowformer(sd: Mapping[str, Any], encoder_depth: int = 3
                       ) -> Dict[str, Any]:
    """FlowFormer (PerCostFormer3) state dict -> stitchax FlowFormer params.

    Accepts either a bare FlowFormer state dict (things_288960.pth-style) or
    the fused FlowHomoAdpater ckpt's `flow_backbone.` subtree (final_ckpt,
    reference: out.py:72-87). Key map derived from
    core/FlowFormer/PerCostFormer3/{transformer,encoder,decoder,gru,gma}.py.
    """
    sd = strip_module_prefix(sd)
    if any(k.startswith("flow_backbone.") for k in sd):
        sd = {k[len("flow_backbone."):]: v for k, v in sd.items()
              if k.startswith("flow_backbone.")}

    params: Dict[str, Any] = {}
    params["context_encoder"] = convert_twins_svt(sd, "context_encoder")

    me: Dict[str, Any] = {}
    me["feat_encoder"] = convert_twins_svt(sd, "memory_encoder.feat_encoder")

    me["cost_perceiver"] = convert_cost_perceiver(
        sd, "memory_encoder.cost_perceiver_encoder", encoder_depth)
    params["memory_encoder"] = me

    md = "memory_decoder"
    ca = f"{md}.decoder_layer.cross_attend"
    dec: Dict[str, Any] = {
        "proj": _convp(sd, f"{md}.proj"),
        "att": {"to_qk": _convp(sd, f"{md}.att.to_qk")},
        # cross-attention k/v are hoisted out of the iteration scan
        "memory_k": _lin(sd, f"{ca}.k"),
        "memory_v": _lin(sd, f"{ca}.v"),
        "iteration": {
            "flow_token_enc1": _convp(sd, f"{md}.flow_token_encoder.0"),
            "flow_token_enc2": _convp(sd, f"{md}.flow_token_encoder.2"),
            "decoder_layer": _attention_layer(sd, ca, with_kv=False),
            "update_block": {
                "encoder": {n: _convp(sd, f"{md}.update_block.encoder.{n}")
                            for n in ("convc1", "convc2", "convf1", "convf2",
                                      "conv")},
                "gru": {n: _convp(sd, f"{md}.update_block.gru.{n}")
                        for n in ("convz1", "convr1", "convq1",
                                  "convz2", "convr2", "convq2")},
                "flow_head": {n: _convp(sd, f"{md}.update_block.flow_head.{n}")
                              for n in ("conv1", "conv2")},
                "aggregator": {
                    "to_v": _convp(sd, f"{md}.update_block.aggregator.to_v"),
                    "gamma": _np(sd[f"{md}.update_block.aggregator.gamma"]),
                },
            },
        },
        # upsample-mask head, hoisted out of the iteration scan (stitchax
        # computes it only for upsampled iterations; reference
        # gru.py:313-318 keeps it inside the update block)
        "mask_head": {
            "mask1": _convp(sd, f"{md}.update_block.mask.0"),
            "mask2": _convp(sd, f"{md}.update_block.mask.2"),
        },
    }
    # MAE pretrain head (reference: decoder.py:166-180, gt_r>0 Sequential
    # with convs at .0/.2/.4) — present in pretrain-era checkpoints only
    if f"{md}.pretrain_head.0.weight" in sd:
        dec["pretrain_head0"] = _convp(sd, f"{md}.pretrain_head.0")
        dec["pretrain_head1"] = _convp(sd, f"{md}.pretrain_head.2")
        dec["pretrain_head2"] = _convp(sd, f"{md}.pretrain_head.4")
    params["memory_decoder"] = dec
    return {"params": params}


# ------------------------------- TransRef ------------------------------------


def _dwconv_mlp(sd, p):
    """TransRef Mlp: fc1 -> DWConv(.dwconv.dwconv) -> fc2 (TransRef.py:358)."""
    return {"fc1": _lin(sd, f"{p}.fc1"),
            "dwconv": _convp(sd, f"{p}.dwconv.dwconv"),
            "fc2": _lin(sd, f"{p}.fc2")}


def _transref_block(sd, p, sr: int, attention: str = "self"):
    """Block / Block_Ref / Block_dec (TransRef.py:597-716). Block_dec uses
    the plain `Attention` class (TransRef.py:604-608) — Attention_dec with
    its task_query is dead code — so decoder blocks convert like self
    blocks (activation-verified in tests/test_parity_transref.py)."""
    a = f"{p}.attn"
    attn: Dict[str, Any] = {"q": _lin(sd, f"{a}.q"),
                            "kv": _lin(sd, f"{a}.kv"),
                            "proj": _lin(sd, f"{a}.proj")}
    if sr > 1:
        attn["sr"] = _convp(sd, f"{a}.sr")
        attn["sr_norm"] = norm_params(f"{a}.norm", sd)
    out = {"norm1": norm_params(f"{p}.norm1", sd),
           "norm2": norm_params(f"{p}.norm2", sd),
           "attn": attn,
           "mlp": _dwconv_mlp(sd, f"{p}.mlp")}
    if attention == "ref":
        out["norm1_ref"] = norm_params(f"{p}.norm1_Ref", sd)
    return out


def _patch_embed(sd, p):
    return {"proj": _convp(sd, f"{p}.proj"),
            "norm": norm_params(f"{p}.norm", sd)}


def _fold_bn_into_conv(sd, conv_p, bn_p, eps=1e-5):
    """Inference-time fold of Conv+BatchNorm (the non-local W head,
    reference: non_local_embedded_gaussian.py bn_layer=True) into one conv."""
    w = conv_kernel(sd[f"{conv_p}.weight"])
    b = _np(sd.get(f"{conv_p}.bias", np.zeros(w.shape[-1], np.float32)))
    gamma = _np(sd[f"{bn_p}.weight"])
    beta = _np(sd[f"{bn_p}.bias"])
    mean = _np(sd[f"{bn_p}.running_mean"])
    var = _np(sd[f"{bn_p}.running_var"])
    s = gamma / np.sqrt(var + eps)
    return {"kernel": w * s[None, None, None, :],
            "bias": (b - mean) * s + beta}


def _non_local(sd, p):
    # sub_sample=True wraps g and phi in Sequential(conv, maxpool) -> '.0'
    g_key = f"{p}.g.0" if f"{p}.g.0.weight" in sd else f"{p}.g"
    phi_key = f"{p}.phi.0" if f"{p}.phi.0.weight" in sd else f"{p}.phi"
    return {"g": _convp(sd, g_key),
            "phi": _convp(sd, phi_key),
            "theta": _convp(sd, f"{p}.theta"),
            "w": _fold_bn_into_conv(sd, f"{p}.W.0", f"{p}.W.1")}


def _refpa(sd, p):
    doe = f"{p}.PA.offset_estimator"
    est = {}
    for i in (1, 2, 3):
        est[f"down{i}"] = _convp(sd, f"{doe}.downblock{i}.0")
        est[f"attn{i}"] = _non_local(sd, f"{doe}.attentionblock{i}")
        up = {"kernel": conv_transpose_kernel_op(
            sd[f"{doe}.upblock{i}.0.weight"]),
            "bias": _np(sd[f"{doe}.upblock{i}.0.bias"])}
        est[f"up{i}"] = up
    est["scale"] = _convp(sd, f"{doe}.channelscaling_block")
    # mmcv DeformConv2d weight (O, I, 3, 3) -> (9*I, O) matmul matrix with
    # tap-major flattening (stitchax/ops/deform.py layout)
    dw = _np(sd[f"{p}.PA.deformconv.weight"])
    O, I, K, _ = dw.shape
    deform_kernel = dw.transpose(2, 3, 1, 0).reshape(K * K * I, O)
    return {
        "pa": {"offset_estimator": est,
               "offset_conv": {"kernel": conv_kernel(
                   sd[f"{p}.PA.offset_conv.weight"])},
               "deform_kernel": deform_kernel},
        "ph": {"fc1": _convp(sd, f"{p}.PH.fc.0"),
               "fc2": _convp(sd, f"{p}.PH.fc.2"),
               "reduc": _convp(sd, f"{p}.PH.reduc.0")},
    }


def convert_transref(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """TransRef_Base state dict (400_Trans.pth['net'], reference:
    transref_inpainter.py:25-26) -> stitchax TransRefBase params."""
    sd = strip_module_prefix(sd)
    TEN_SRS = (4, 2, 2, 1)
    tenc: Dict[str, Any] = {}
    for i in (1, 2, 3, 4):
        tenc[f"patch_embed{i}"] = _patch_embed(sd, f"Tenc.patch_embed{i}")
        if i < 4:
            tenc[f"patch_embed{i}_ref"] = _patch_embed(
                sd, f"Tenc.patch_embed{i}_ref")
            tenc[f"mini_patch_embed{i}"] = _patch_embed(
                sd, f"Tenc.mini_patch_embed{i}")
            tenc[f"mini_patch_embed{i}_ref"] = _patch_embed(
                sd, f"Tenc.mini_patch_embed{i}_ref")
            tenc[f"refpa{i}"] = _refpa(sd, f"Tenc.RefPA{i}")
            tenc[f"pnorm{i}"] = norm_params(f"Tenc.pnorm{i}", sd)
            # patch_block sr ratios (TransRef.py:89-123): stage i-1's sr
            pb_sr = TEN_SRS[i - 1]
            tenc[f"patch_block{i}_0"] = _transref_block(
                sd, f"Tenc.patch_block{i}.0", pb_sr, "ref")
        tenc[f"norm{i}"] = norm_params(f"Tenc.norm{i}", sd)
        for j in range(2):
            tenc[f"block{i}_{j}"] = _transref_block(
                sd, f"Tenc.block{i}.{j}", TEN_SRS[i - 1])

    tdec: Dict[str, Any] = {
        "patch_embed1": _patch_embed(sd, "Tdec.patch_embed1"),
        "norm1": norm_params("Tdec.norm1", sd),
    }
    for j in range(3):
        tdec[f"block1_{j}"] = _transref_block(sd, f"Tdec.block1.{j}", 1)

    tail: Dict[str, Any] = {}
    for name in ("convd32x", "convd16x", "convd8x", "convd4x", "convd2x",
                 "convd1x"):
        tail[name] = {"kernel": conv_transpose_kernel(
            sd[f"convtail.{name}.conv2d.weight"]),
            "bias": _np(sd[f"convtail.{name}.conv2d.bias"])}
    for my, ref in (("dense4", "dense_4"), ("dense3", "dense_3"),
                    ("dense2", "dense_2"), ("dense1", "dense_1")):
        tail[my] = {
            "conv1": _convp(sd, f"convtail.{ref}.0.conv1.conv2d"),
            "conv2": _convp(sd, f"convtail.{ref}.0.conv2.conv2d"),
        }

    return {"params": {
        "tenc": tenc, "tdec": tdec, "convtail": tail,
        "clean": _convp(sd, "clean.conv2d"),
    }}


# --------------------------- npz param snapshots ----------------------------
#
# Trained-in-repo weights need a durable, framework-native container (the
# reference ships torch .pth files via Google Drive, README.md:8; stitchax
# trains its own). bf16 is lossless for inference here: every model runs
# through bf16_call on device, so fp32 masters are cast to bf16 at call
# time anyway.

def save_params_npz(path: str, tree: Any) -> None:
    """Save a (nested-dict) param tree as a compressed npz, float32 leaves
    stored as bf16 bit patterns (half the bytes, inference-lossless)."""
    import jax
    import ml_dtypes
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(kp)
        arr = np.asarray(leaf)
        if arr.dtype == np.float32:
            arr = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            key = "bf16:" + key
        flat[key] = arr
    np.savez_compressed(path, **flat)


def load_params_npz(path: str, target: Any) -> Any:
    """Load an npz saved by save_params_npz into `target`'s tree structure
    (leaf paths must match; leaves are cast to the target leaf dtypes)."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    data = np.load(path)
    stored: Dict[str, np.ndarray] = {}
    for k in data.files:
        if k.startswith("bf16:"):
            stored[k[len("bf16:"):]] = np.asarray(
                data[k]).view(ml_dtypes.bfloat16).astype(np.float32)
        else:
            stored[k] = np.asarray(data[k])
    paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    leaves = []
    for kp, leaf in paths:
        key = jax.tree_util.keystr(kp)
        if key not in stored:
            raise KeyError(f"npz {path} missing param {key}")
        arr = stored[key]
        ref = np.asarray(leaf)
        if arr.shape != ref.shape:
            raise ValueError(
                f"npz param {key}: shape {arr.shape} != target {ref.shape}")
        leaves.append(jnp.asarray(arr, dtype=ref.dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def npz_has_subtree(path: str, name: str) -> bool:
    """True if any stored leaf path starts at top-level key `name`."""
    data = np.load(path)
    probe = f"['{name}']"
    return any(k.split(":", 1)[-1].startswith(probe) for k in data.files)
