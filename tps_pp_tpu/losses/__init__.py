from .ce import CELoss, SARLoss, TFLoss
from .ctc import CTCLoss
from .abi import ABILoss
from .kd import KD_Loss, kd_loss

__all__ = ['CELoss', 'SARLoss', 'TFLoss', 'CTCLoss', 'ABILoss', 'KD_Loss',
           'kd_loss']
