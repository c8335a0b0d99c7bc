from rtdm_tpu.eval.classification import ClassificationMetrics

__all__ = ["ClassificationMetrics"]
