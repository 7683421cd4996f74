"""stitchax.models — the model zoo (L1).

TPU-native Flax reimplementations of the reference's backbones:
  * TwinsSVT               (reference: core/FlowFormer/encoders.py + twins.py)
  * FlowFormer (PerCost3)  (reference: core/FlowFormer/PerCostFormer3/)
  * UDIS2HomographyNet     (reference: core/UDIS2/Homography/network.py)
  * CompositionNet         (reference: core/UDIS2/Composition/network.py)
  * TransRef inpainter     (reference: .../TransRef/models/TransRef.py)
  * Diffusion inpainter    (reference: .../utils/inpainter.py)
"""

from .twins import TwinsSVT
from .flowformer import (FlowFormer, FlowFormerConfig,
                         FlowFormerPretrain)
from .udis2 import (UDIS2HomographyNet, CompositionNet, compose_seam,
                    ccl_correlation_flow)
from .resnet import ResNet50Stages
from .transref import TransRefBase, make_default_transref_apply
from .quater_upsampler import QuaterUpsampler
from .vgg import (VGG16Features, perceptual_loss, style_loss,
                  transref_total_loss)
from .vae import AutoencoderKL, convert_vae
from .clip_text import ClipTextEncoder, convert_clip_text, empty_prompt_tokens
from .diffusion import (ControlNet, UNetConfig, UNet2DCondition,
                        convert_controlnet, convert_sd_unet)
from .sd_pipeline import load_sd_checkpoint, make_sd_inpaint_fn

__all__ = ["TwinsSVT", "FlowFormer", "FlowFormerConfig",
           "FlowFormerPretrain", "UDIS2HomographyNet",
           "CompositionNet", "compose_seam", "ccl_correlation_flow",
           "ResNet50Stages", "TransRefBase", "make_default_transref_apply",
           "QuaterUpsampler", "VGG16Features", "perceptual_loss",
           "style_loss", "transref_total_loss",
           "AutoencoderKL", "convert_vae", "ClipTextEncoder",
           "convert_clip_text", "empty_prompt_tokens", "ControlNet",
           "UNetConfig", "UNet2DCondition", "convert_controlnet",
           "convert_sd_unet", "load_sd_checkpoint", "make_sd_inpaint_fn"]
