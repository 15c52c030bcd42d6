from .tps_pp import TPS_PP, MSFA, CBAM, DGAB, TPE

__all__ = ['TPS_PP', 'MSFA', 'CBAM', 'DGAB', 'TPE']
