"""UDIS2 homography regression + composition networks in Flax.

Reference: core/UDIS2/Homography/network.py (resnet50 pyramid + CCL
contextual correlation + conv/FC regression to 4-corner offsets) and
core/UDIS2/Composition/network.py (siamese dilated U-Net seam-mask net).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNet50Stages


def _extract_patches_3x3(f: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W, 9*C) zero-padded 3x3 patches, (dy,dx)-major."""
    B, H, W, C = f.shape
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for dy in range(3):
        for dx in range(3):
            taps.append(fp[:, dy:dy + H, dx:dx + W, :])
    return jnp.concatenate(taps, axis=-1)


def ccl_correlation_flow(feature_1: jnp.ndarray, feature_2: jnp.ndarray,
                         softmax_scale: float = 10.0) -> jnp.ndarray:
    """Contextual correlation layer: L2-normalized 3x3 patch matching of
    feature_1 against every position of feature_2, scaled softmax over
    positions, then the expectation displacement field
    (reference: core/UDIS2/Homography/network.py:147-199).

    The per-batch conv with dynamic filters is recast as one big matmul
    (patches1 @ patches2^T) which maps straight onto the MXU.
    Returns (B, H, W, 2) flow, channels (dx, dy).
    """
    B, H, W, C = feature_1.shape
    n1 = feature_1 / jnp.maximum(
        jnp.linalg.norm(feature_1, axis=-1, keepdims=True), 1e-12)
    n2 = feature_2 / jnp.maximum(
        jnp.linalg.norm(feature_2, axis=-1, keepdims=True), 1e-12)

    p1 = _extract_patches_3x3(n1).reshape(B, H * W, 9 * C)
    p2 = _extract_patches_3x3(n2).reshape(B, H * W, 9 * C)
    # match_vol[b, i, c] = <patch of f1 at i, patch of f2 at c>
    match = jnp.einsum("bik,bck->bic", p1, p2,
                       preferred_element_type=jnp.float32).astype(feature_1.dtype)
    attn = jax.nn.softmax(match * softmax_scale, axis=-1)  # over target pos c

    cy, cx = jnp.meshgrid(jnp.arange(H, dtype=feature_1.dtype),
                          jnp.arange(W, dtype=feature_1.dtype), indexing="ij")
    tgt_x = cx.reshape(-1)  # (HW,) target x coordinate per c
    tgt_y = cy.reshape(-1)
    exp_x = attn @ tgt_x  # (B, HW)
    exp_y = attn @ tgt_y
    src_x = cx.reshape(-1)[None]
    src_y = cy.reshape(-1)[None]
    flow_w = (exp_x - src_x).reshape(B, H, W)
    flow_h = (exp_y - src_y).reshape(B, H, W)
    return jnp.stack([flow_w, flow_h], axis=-1)


class HomographyRegressionHead(nn.Module):
    """Conv stack + FC head: (B, 32, 32, 2) flow -> (B, 8) corner offsets
    (reference: core/UDIS2/Homography/network.py:18-46)."""

    @nn.compact
    def __call__(self, x):
        widths = [64, 128, 256]
        for i, w in enumerate(widths):
            x = nn.relu(nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                                name=f"conv{i}a")(x))
            x = nn.relu(nn.Conv(w, (3, 3), padding="SAME", use_bias=False,
                                name=f"conv{i}b")(x))
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        B = x.shape[0]
        # torch flattens NCHW (C,H,W order); transpose for converter parity
        x = x.transpose(0, 3, 1, 2).reshape(B, -1)
        x = nn.relu(nn.Dense(4096, name="fc1")(x))
        x = nn.relu(nn.Dense(1024, name="fc2")(x))
        return nn.Dense(8, name="fc3")(x)


class UDIS2HomographyNet(nn.Module):
    """Full homography backbone: resnet features on both inputs, CCL at 1/16
    res, regression to 8 corner-offset values
    (reference: core/UDIS2/Homography/network.py:12-137, only_homo=True path).
    Inputs are [-1, 1] NHWC."""

    @nn.compact
    def __call__(self, input1, input2, train: bool = False):
        backbone = ResNet50Stages(name="feature_extractor")
        feats1 = backbone(input1, train)
        feats2 = backbone(input2, train)
        f1_32, f2_32 = feats1[-1], feats2[-1]  # 1/16 res, 1024 ch
        corr_flow = ccl_correlation_flow(f1_32, f2_32)
        offset = HomographyRegressionHead(name="regress1")(corr_flow)
        return offset


class CompositionDownBlock(nn.Module):
    """(reference: core/UDIS2/Composition/network.py:23-44). Keeps the torch
    quirk of padding=1 with dilation>1, which shrinks H/W by 2*(d-1) per conv;
    the UpBlock resize makes the shapes recombine."""
    features: int
    dilation: int
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        if self.pool:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        d = self.dilation
        for name in ("conv1", "conv2"):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_dilation=(d, d), name=name)(x)
            x = nn.relu(x)
        return x


class CompositionUpBlock(nn.Module):
    """(reference: core/UDIS2/Composition/network.py:46-76)."""
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x1, x2):
        B, H2, W2, _ = x2.shape
        # torch F.interpolate(mode='nearest') indexing: floor(i * in / out)
        # (jax.image.resize 'nearest' uses half-pixel centers and picks
        # different taps on the odd sizes the dilated downs produce —
        # caught by tests/test_parity_udis2.py)
        iy = jnp.floor(jnp.arange(H2) * (x1.shape[1] / H2)).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(W2) * (x1.shape[2] / W2)).astype(jnp.int32)
        x1 = x1[:, iy][:, :, ix]
        x1 = nn.relu(nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                             name="half")(x1))
        x = jnp.concatenate([x2, x1], axis=-1)
        d = self.dilation
        for name in ("conv1", "conv2"):
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        kernel_dilation=(d, d), name=name)(x)
            x = nn.relu(x)
        return x


class CompositionNet(nn.Module):
    """Siamese dilated U-Net predicting the img1 seam mask
    (reference: core/UDIS2/Composition/network.py:77-129). Inputs [-1,1]."""

    @nn.compact
    def __call__(self, warp1, warp2, mask1, mask2):
        down1 = CompositionDownBlock(32, 1, pool=False, name="down1")
        down2 = CompositionDownBlock(64, 2, name="down2")
        down3 = CompositionDownBlock(128, 3, name="down3")
        down4 = CompositionDownBlock(256, 4, name="down4")
        down5 = CompositionDownBlock(512, 5, name="down5")
        up1 = CompositionUpBlock(256, 4, name="up1")
        up2 = CompositionUpBlock(128, 3, name="up2")
        up3 = CompositionUpBlock(64, 2, name="up3")
        up4 = CompositionUpBlock(32, 1, name="up4")

        def encode(t):
            t1 = down1(t)
            t2 = down2(t1)
            t3 = down3(t2)
            t4 = down4(t3)
            t5 = down5(t4)
            return t1, t2, t3, t4, t5

        x1, x2, x3, x4, x5 = encode(warp1)
        y1, y2, y3, y4, y5 = encode(warp2)

        res = up1(x5 - y5, x4 - y4)
        res = up2(res, x3 - y3)
        res = up3(res, x2 - y2)
        res = up4(res, x1 - y1)
        res = nn.Conv(1, (1, 1), name="out")(res)
        return nn.sigmoid(res)


def compose_seam(out, warp1, warp2, mask1, mask2):
    """Blend with learned masks (reference: Composition/network.py:8-20).
    warp tensors are in [-1, 1]."""
    learned_mask1 = (mask1 - mask1 * mask2) + mask1 * mask2 * out
    learned_mask2 = (mask2 - mask1 * mask2) + mask1 * mask2 * (1 - out)
    stitched = (warp1 + 1.0) * learned_mask1 + (warp2 + 1.0) * learned_mask2 - 1.0
    return dict(learned_mask1=learned_mask1, learned_mask2=learned_mask2,
                stitched_image=stitched)
