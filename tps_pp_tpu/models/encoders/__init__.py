from .nrtr import NRTREncoder
from .sar import SAREncoder
from .satrn import SatrnEncoder, ChannelReductionEncoder
from .abi import TransformerEncoder, ABIVisionModel

__all__ = ['NRTREncoder', 'SAREncoder', 'SatrnEncoder',
           'ChannelReductionEncoder', 'TransformerEncoder', 'ABIVisionModel']
