from .resnet_abi import ResNetABI, ResNetABI_v2_large, ResNetABIBase
from .resnet31 import ResNet31OCR
from .vgg import VeryDeepVgg
from .misc import ShallowCNN, NRTRModalityTransform

__all__ = ['ResNetABI', 'ResNetABI_v2_large', 'ResNetABIBase', 'ResNet31OCR',
           'VeryDeepVgg', 'ShallowCNN', 'NRTRModalityTransform']
