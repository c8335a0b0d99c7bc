from rtdm_tpu.models.acff import ACFF
from rtdm_tpu.models.darknet import Darknet, create_darknet
from rtdm_tpu.models.ernet import (ErNET, SqueezeErNET, SqueezeRedConv,
                                   create_model, with_checkpoint_head)
from rtdm_tpu.models.yolov5 import YoloV5, create_yolov5

__all__ = ["ACFF", "Darknet", "ErNET", "SqueezeErNET", "SqueezeRedConv",
           "YoloV5", "create_darknet", "create_model", "create_yolov5",
           "with_checkpoint_head"]
