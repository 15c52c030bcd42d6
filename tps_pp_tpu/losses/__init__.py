from .ce import CELoss, SARLoss, TFLoss
from .ctc import CTCLoss
from .abi import ABILoss

__all__ = ['CELoss', 'SARLoss', 'TFLoss', 'CTCLoss', 'ABILoss']
