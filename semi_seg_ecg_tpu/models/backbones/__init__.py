from .resnet import ResNet1D, resnet18, resnet34, resnet50, resnet101, resnet152  # noqa: F401
from .vision_transformer import VisionTransformer1D, vit_tiny, vit_small, vit_base  # noqa: F401
