"""Minimal timm stand-in for importing the reference implementation.

Only the surface the reference touches is provided (timm is not installed
in this image). `create_model('twins_svt_large')` returns the reference's
own Twins class (core/FlowFormer/PerCostFormer3/twins.py, which is the
timm architecture the real checkpoints were trained with) configured with
the published svt-large hyperparameters.
"""

from . import data, models  # noqa: F401


def create_model(model_name, pretrained=False, **kwargs):
    if model_name in ("twins_svt_large", "twins_svt_large_context"):
        # lazy import: twins.py itself imports timm (this package)
        from core.FlowFormer.PerCostFormer3 import twins as _twins

        class _PlainBlock(_twins.Block):
            # timm's Block.forward has no `context` arg; the reference
            # copy's Block passes one, which its own plain (non-RPE)
            # attention classes don't accept — restore timm semantics
            def forward(self, x, size, context=None):
                x = x + self.drop_path(self.attn(self.norm1(x), size))
                x = x + self.drop_path(self.mlp(self.norm2(x)))
                return x

        Twins = _twins.Twins
        return Twins(block_cls=_PlainBlock,
                     patch_size=4,
                     embed_dims=[128, 256, 512, 1024],
                     num_heads=[4, 8, 16, 32],
                     mlp_ratios=[4, 4, 4, 4],
                     depths=[2, 2, 18, 2],
                     wss=[7, 7, 7, 7],
                     sr_ratios=[8, 4, 2, 1])
    raise NotImplementedError(f"stub timm has no model {model_name!r}")
