"""Pure-torch DeformConv2d with mmcv deform_conv v1 semantics (no
modulation mask, zero-padded out-of-bounds bilinear sampling, offsets as
2*K*K channels ordered (dy, dx) per tap, taps row-major). Serves as an
importable oracle for the TransRef RefPA parity tests; mmcv itself is not
installed in this image."""

import torch
import torch.nn as nn


def _bilinear_zero(x, sx, sy):
    """x (B, C, H, W); sx/sy (B, H', W') pixel coords -> (B, C, H', W')."""
    B, C, H, W = x.shape
    x0 = torch.floor(sx)
    y0 = torch.floor(sy)
    wx = sx - x0
    wy = sy - y0

    out = 0.0
    for dx, dy, w in ((0, 0, (1 - wx) * (1 - wy)), (1, 0, wx * (1 - wy)),
                      (0, 1, (1 - wx) * wy), (1, 1, wx * wy)):
        xi = (x0 + dx).long()
        yi = (y0 + dy).long()
        inb = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)).to(x.dtype)
        xi = xi.clamp(0, W - 1)
        yi = yi.clamp(0, H - 1)
        flat = (yi * W + xi).reshape(B, 1, -1).expand(B, C, -1)
        vals = torch.gather(x.reshape(B, C, -1), 2, flat)
        vals = vals.reshape(B, C, *sx.shape[1:])
        out = out + vals * (w * inb)[:, None]
    return out


class DeformConv2d(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                 padding=1, dilation=1, groups=1, deform_groups=1,
                 bias=False):
        super().__init__()
        assert stride == 1 and dilation == 1 and groups == 1
        assert deform_groups == 1 and not bias
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        assert padding == k // 2, "stub supports 'same' padding only"
        self.kernel_size = (k, k)
        self.weight = nn.Parameter(
            torch.empty(out_channels, in_channels, k, k))
        nn.init.kaiming_uniform_(self.weight, a=5 ** 0.5)

    def forward(self, x, offset):
        B, C, H, W = x.shape
        k = self.kernel_size[0]
        r = k // 2
        ys, xs = torch.meshgrid(torch.arange(H, dtype=x.dtype),
                                torch.arange(W, dtype=x.dtype),
                                indexing="ij")
        cols = []
        for i in range(k):
            for j in range(k):
                t = i * k + j
                dy = offset[:, 2 * t]
                dx = offset[:, 2 * t + 1]
                sy = ys[None] + (i - r) + dy
                sx = xs[None] + (j - r) + dx
                cols.append(_bilinear_zero(x, sx, sy))     # (B, C, H, W)
        col = torch.stack(cols, 2).reshape(B, C * k * k, H * W)
        w = self.weight.reshape(self.weight.shape[0], -1)  # (Cout, C*k*k)
        # weight layout is (Cout, Cin, kh, kw) so col must be (Cin, kh*kw)
        # -> stack taps after channels
        return (w @ col).reshape(B, -1, H, W)

    # mmcv stores weight as (out, in, kh, kw); cols above are stacked as
    # (C, taps) per pixel which matches that reshape order.
