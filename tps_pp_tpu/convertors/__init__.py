from .base import BaseConvertor
from .attn import AttnConvertor
from .ctc import CTCConvertor
from .abi import ABIConvertor
from .seg import SegConvertor
from .mask import MaskCTCConvertor, Mask_ABIConvertor

__all__ = ['BaseConvertor', 'AttnConvertor', 'CTCConvertor', 'ABIConvertor',
           'MaskCTCConvertor', 'Mask_ABIConvertor',
           'SegConvertor']
