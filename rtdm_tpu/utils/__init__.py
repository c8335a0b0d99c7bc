from rtdm_tpu.utils.meters import AverageMeter
from rtdm_tpu.utils.early_stopping import EarlyStopping

__all__ = ["AverageMeter", "EarlyStopping"]
