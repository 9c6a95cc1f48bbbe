from .vgg16 import VGG16Backbone
from .mobilenet_v2 import MobileNetV2Backbone

__all__ = ["VGG16Backbone", "MobileNetV2Backbone"]
