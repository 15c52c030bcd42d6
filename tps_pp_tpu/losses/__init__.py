from .ce import CELoss, SARLoss, TFLoss
from .ctc import CTCLoss

__all__ = ['CELoss', 'SARLoss', 'TFLoss', 'CTCLoss']
