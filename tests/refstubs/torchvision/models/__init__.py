from . import resnet  # noqa: F401
from .vgg import vgg16  # noqa: F401
