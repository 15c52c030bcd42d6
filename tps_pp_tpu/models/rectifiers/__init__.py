from .tps_pp import TPS_PP, MSFA, CBAM, DGAB, TPE
from .tps_stn import TPSPreprocessor, BasePreprocessor

__all__ = ['TPS_PP', 'MSFA', 'CBAM', 'DGAB', 'TPE', 'TPSPreprocessor',
           'BasePreprocessor']
