from .resnet import ResNet  # noqa: F401
from .second_fpn import SECONDFPN  # noqa: F401
from .unet3d import Unet3D, Hourglass3D  # noqa: F401
from .field import FieldBackbone  # noqa: F401
from .centerpoint_head import BEVDepthHead, detection_loss, decode_preds  # noqa: F401
from .vampire import Vampire  # noqa: F401
