from .resnet import ResNet  # noqa: F401
from .second_fpn import SECONDFPN  # noqa: F401
