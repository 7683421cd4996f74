#!/usr/bin/env python
"""Build a RANDOM-weights packed SD checkpoint at reduced scale.

The reference's diffusion inpainter downloads runwayml/lllyasviel weights
at import (reference: core/inference/mix_methods/utils/inpainter.py:13-25);
this environment is zero-egress, so `out.py --inf_cfg
inpaint_all_area_g12_diffusion` would otherwise always take the
(loudly-warned) classical fallback. This tool packs RANDOM diffusers-layout
state dicts — at a reduced but structurally-real scale — into the container
`stitchax.models.sd_pipeline.load_sd_checkpoint` reads, including the
"configs" sizing entry, so the REAL UNet+ControlNet+VAE DDIM plugin path
runs end to end in-environment:

    python tools/make_random_sd_checkpoint.py --out /tmp/sd_rand.pt
    STITCHAX_SD_CKPT=/tmp/sd_rand.pt python out.py \
        --data_root_path demo_data/ --txt_file demo.txt \
        --inf_cfg inpaint_all_area_g12_diffusion

What this demonstrates is the PLUMBING (pack -> convert -> size -> DDIM
scan -> composite), not quality: the weights are noise. Real quality needs
the offline tools/pack_sd_checkpoint.py conversion of the published SD-1.5
weights. The synthetic diffusers-layout generators are shared with the
converter structure tests (tests/test_diffusion_pipeline.py).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sd_rand.pt")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=32,
                    help="UNet base channels (SD-1.5 uses 320)")
    args = ap.parse_args()

    import numpy as np
    import torch

    from stitchax.models.diffusion import UNetConfig
    from test_diffusion_pipeline import (_controlnet_keys, _fake_sd,
                                         _unet_keys, _vae_keys)

    rng = np.random.default_rng(args.seed)
    w = args.width
    unet_kw = dict(in_channels=9, out_channels=4,
                   block_channels=(w, 2 * w), layers_per_block=1,
                   attention_resolutions=(0, 1), context_dim=2 * w,
                   num_heads=4, num_train_timesteps=1000, norm_groups=8)
    vae_kw = dict(block_channels=(w, w, w, w), latent_channels=4, groups=8)
    clip_kw = dict(vocab_size=49408, width=2 * w, layers=2, heads=4)

    cfg = UNetConfig(**unet_kw)
    unet_sd = _fake_sd(_unet_keys(cfg), rng)
    cnet_sd = _fake_sd(_controlnet_keys(cfg), rng)
    vae_sd = _fake_sd(_vae_keys(vae_kw["block_channels"],
                                vae_kw["latent_channels"]), rng)

    # transformers random-init CLIP (installed; local config, no downloads)
    # with the full vocab so empty_prompt_tokens' BOS/EOS ids resolve
    from transformers import CLIPTextConfig, CLIPTextModel
    torch.manual_seed(args.seed)
    clip = CLIPTextModel(CLIPTextConfig(
        vocab_size=clip_kw["vocab_size"], hidden_size=clip_kw["width"],
        intermediate_size=4 * clip_kw["width"],
        num_hidden_layers=clip_kw["layers"],
        num_attention_heads=clip_kw["heads"],
        max_position_embeddings=77, hidden_act="quick_gelu"))

    torch.save({"unet": unet_sd, "controlnet": cnet_sd, "vae": vae_sd,
                "clip": clip.state_dict(),
                "configs": {"unet": unet_kw, "vae": vae_kw,
                            "clip": clip_kw}}, args.out)
    mb = os.path.getsize(args.out) / 1e6
    print(f"packed random SD checkpoint -> {args.out} ({mb:.1f} MB)")


if __name__ == "__main__":
    main()
