from .deform_conv import DeformConv2d  # noqa: F401
