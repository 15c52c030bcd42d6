from .tps_pp import TPS_PP, MSFA, CBAM, DGAB, TPE
from .tps_stn import TPSPreprocessor, BasePreprocessor
from .moran import MORAN
from .spin import SPIN

__all__ = ['TPS_PP', 'MSFA', 'CBAM', 'DGAB', 'TPE', 'TPSPreprocessor',
           'BasePreprocessor', 'MORAN', 'SPIN']
