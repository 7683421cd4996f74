#!/usr/bin/env python
"""Pack diffusers SD-1.5 inpaint + ControlNet weights into the single
torch container stitchax's diffusion inpainter loads
(stitchax/models/sd_pipeline.py:load_sd_checkpoint).

Run this OFFLINE on a machine with diffusers installed and the models
downloaded (this TPU environment is zero-egress):

    python tools/pack_sd_checkpoint.py --out sd15_inpaint_pack.pt \
        [--model runwayml/stable-diffusion-inpainting] \
        [--controlnet lllyasviel/control_v11p_sd15_inpaint]

then point STITCHAX_SD_CKPT (or get_inpainter('inpainter', ckpt=...)) at
the output file. The container is {"unet": sd, "controlnet": sd,
"vae": sd, "clip": sd} — plain fp32 state dicts.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="runwayml/stable-diffusion-inpainting")
    ap.add_argument("--controlnet",
                    default="lllyasviel/control_v11p_sd15_inpaint")
    args = ap.parse_args()

    import torch
    from diffusers import ControlNetModel, UNet2DConditionModel, AutoencoderKL
    from transformers import CLIPTextModel

    unet = UNet2DConditionModel.from_pretrained(args.model, subfolder="unet")
    vae = AutoencoderKL.from_pretrained(args.model, subfolder="vae")
    clip = CLIPTextModel.from_pretrained(args.model,
                                         subfolder="text_encoder")
    cnet = ControlNetModel.from_pretrained(args.controlnet)

    torch.save({"unet": unet.state_dict(),
                "controlnet": cnet.state_dict(),
                "vae": vae.state_dict(),
                "clip": clip.state_dict()}, args.out)
    print(f"packed -> {args.out}")


if __name__ == "__main__":
    main()
