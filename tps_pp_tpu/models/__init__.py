from . import layers, transformer
from .backbones import *  # noqa
from .rectifiers import *  # noqa
from .encoders import *  # noqa
from .decoders import *  # noqa
from .recognizers import *  # noqa
from .fusers import ABIFuser
from .common import UNet, DiceLoss, FocalLoss
from . import textdet, kie, ner  # noqa  (registry side effects)
