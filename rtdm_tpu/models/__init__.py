from rtdm_tpu.models.acff import ACFF
from rtdm_tpu.models.ernet import ErNET, SqueezeErNET, SqueezeRedConv, create_model

__all__ = ["ACFF", "ErNET", "SqueezeErNET", "SqueezeRedConv", "create_model"]
