"""torchvision.transforms.functional stand-in: only crop, with true
torchvision semantics (supports out-of-bounds via zero padding — the
reference crops at (|height_min|, |width_min|) which stays in-bounds)."""

import torch.nn.functional as F


def crop(img, top, left, height, width):
    h, w = img.shape[-2], img.shape[-1]
    if top >= 0 and left >= 0 and top + height <= h and left + width <= w:
        return img[..., top:top + height, left:left + width]
    # torchvision pads out-of-bounds regions with zeros
    pad_l = max(-left, 0)
    pad_t = max(-top, 0)
    pad_r = max(left + width - w, 0)
    pad_b = max(top + height - h, 0)
    img = F.pad(img, (pad_l, pad_r, pad_t, pad_b))
    top, left = top + pad_t, left + pad_l
    return img[..., top:top + height, left:left + width]
