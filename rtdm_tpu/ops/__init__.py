from rtdm_tpu.ops.convpool import (
    conv2d,
    depthwise_conv2d,
    max_pool2d,
    avg_pool2d,
)

__all__ = ["conv2d", "depthwise_conv2d", "max_pool2d", "avg_pool2d"]
