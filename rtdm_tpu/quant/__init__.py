from rtdm_tpu.quant.calibrate import calibrate_classifier, compute_scale
from rtdm_tpu.quant.int8 import quantize_classifier_apply

__all__ = ["calibrate_classifier", "compute_scale", "quantize_classifier_apply"]
