"""ErNET classifier family (EmergencyNet) — TPU-native.

Re-designs of the reference's three AIDER classifiers
(code/disaster_detection/model/{ernet,squeeze_ernet,squeeze_ernet_redconv}.py)
as NHWC flax modules over the shared ACFF block.

Shape flow (verified against the reference model summaries):
- SqueezeErNET @140: 140 ->conv s2-> 69 ->acff-> 67 ->pool-> 33 ->acff-> 31
  ->pool-> 15 ->acff-> 13 ->pool-> 6 ->acff-> 4 ->1x1-> 4x4x5
  ->avgpool(5,1,1)-> 2x2x5 ->fc(20->5)->softmax. 169,241 params.
- SqueezeRedConv adds 1x1 reductions 16->8 / 96->48 / 128->64. 109,569 params.
- ErNET @240: 6 ACFFs, avgpool(5,1,0) -> 3x3x5 -> fc(45->5). 276,118 params.

The final flatten follows torch's NCHW ordering (channel-major) so that the
fc layer is weight-compatible with imported reference checkpoints.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rtdm_tpu.models.acff import ACFF
from rtdm_tpu.models.layers import Conv, Dense
from rtdm_tpu.ops.convpool import avg_pool2d, max_pool2d

NUM_CLASSES = 5
CLASS_NAMES = ("collapsed_building", "fire", "flooded_areas", "normal",
               "traffic_incident")


def _nchw_flatten(x: jax.Array) -> jax.Array:
    """Flatten NHWC in torch's (C,H,W) order for fc-weight compatibility."""
    n = x.shape[0]
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(n, -1)


class _ErnetHead(nn.Module):
    """1x1 conv -> odd avg-pool -> flatten -> fc -> (optional) softmax."""
    pool_padding: int
    num_classes: int = NUM_CLASSES

    @nn.compact
    def __call__(self, x: jax.Array, apply_softmax: bool = True) -> jax.Array:
        x = Conv(self.num_classes, kernel_size=1, use_bias=False,
                 name="conv2")(x)
        x = avg_pool2d(x, 5, 1, self.pool_padding, count_include_pad=True)
        x = _nchw_flatten(x)
        x = Dense(self.num_classes, name="fc")(x)
        if apply_softmax:
            x = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
        return x


class SqueezeErNET(nn.Module):
    """169k-param squeeze variant; input 140x140x3 NHWC."""
    bn_axis: Optional[str] = None
    image_size: int = 140
    dropout_rate: float = 0.2
    num_classes: int = NUM_CLASSES
    # elide the ACFF concat (models/acff.py::_SplitFusedConv1x1) — same
    # params/math, fewer HBM bytes; off by default for bit-stable
    # goldens, enabled by the bench/engine fast path when it wins
    split_fuse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 apply_softmax: bool = True) -> jax.Array:
        ax = self.bn_axis
        x = Conv(16, 3, stride=2, use_bias=False, name="conv1")(x)
        x = ACFF(64, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff1")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(96, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff2")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(128, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff3")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(256, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff4")(x, train)
        return _ErnetHead(pool_padding=1, num_classes=self.num_classes,
                          name="head")(x, apply_softmax and not train)


class SqueezeRedConv(nn.Module):
    """109k-param variant with 1x1 reduction convs; input 140x140x3."""
    bn_axis: Optional[str] = None
    image_size: int = 140
    dropout_rate: float = 0.2
    num_classes: int = NUM_CLASSES
    # elide the ACFF concat (models/acff.py::_SplitFusedConv1x1) — same
    # params/math, fewer HBM bytes; off by default for bit-stable
    # goldens, enabled by the bench/engine fast path when it wins
    split_fuse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 apply_softmax: bool = True) -> jax.Array:
        ax = self.bn_axis
        x = Conv(16, 3, stride=2, use_bias=False, name="conv1")(x)
        x = Conv(8, kernel_size=1, name="conv_red1")(x)
        x = ACFF(64, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff1")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(96, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff2")(x, train)
        x = Conv(48, kernel_size=1, name="conv_red2")(x)
        x = max_pool2d(x, 2, 2)
        x = ACFF(128, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff3")(x, train)
        x = max_pool2d(x, 2, 2)
        x = Conv(64, kernel_size=1, name="conv_red3")(x)
        x = ACFF(256, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff4")(x, train)
        return _ErnetHead(pool_padding=1, num_classes=self.num_classes,
                          name="head")(x, apply_softmax and not train)


class ErNET(nn.Module):
    """276k-param EmergencyNet baseline; input 240x240x3."""
    bn_axis: Optional[str] = None
    image_size: int = 240
    dropout_rate: float = 0.2
    num_classes: int = NUM_CLASSES
    # elide the ACFF concat (models/acff.py::_SplitFusedConv1x1) — same
    # params/math, fewer HBM bytes; off by default for bit-stable
    # goldens, enabled by the bench/engine fast path when it wins
    split_fuse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 apply_softmax: bool = True) -> jax.Array:
        ax = self.bn_axis
        x = Conv(16, 3, stride=2, use_bias=False, name="conv1")(x)
        x = ACFF(64, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff1")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(96, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff2")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(128, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff3")(x, train)
        x = max_pool2d(x, 2, 2)
        x = ACFF(128, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff4")(x, train)
        x = ACFF(128, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff5")(x, train)
        x = ACFF(256, self.dropout_rate, bn_axis=ax, split_fuse=self.split_fuse, name="acff6")(x, train)
        return _ErnetHead(pool_padding=0, num_classes=self.num_classes,
                          name="head")(x, apply_softmax and not train)


MODEL_REGISTRY = {
    "ernet": ErNET,
    "squeeze-ernet": SqueezeErNET,
    "squeeze_ernet": SqueezeErNET,
    "squeeze-redconv": SqueezeRedConv,
    "squeeze_redconv": SqueezeRedConv,
    "squeeze-ernet-redconv": SqueezeRedConv,
}


def create_model(name: str, **kwargs) -> nn.Module:
    key = name.lower()
    if key not in MODEL_REGISTRY:
        raise ValueError(f"unknown model '{name}'; "
                         f"choices: {sorted(set(MODEL_REGISTRY))}")
    return MODEL_REGISTRY[key](**kwargs)


def input_size_for(name: str) -> int:
    """ernet -> 240, squeeze variants -> 140 (config.py:10-106 inference)."""
    return 240 if name.lower() == "ernet" else 140


def with_checkpoint_head(model: nn.Module, variables) -> nn.Module:
    """Rebuild `model` with num_classes matching the checkpoint's fc head.
    Classifier CLIs call this after loading weights so a checkpoint trained
    with a non-default class count (TrainingConfig.num_classes) applies
    instead of crashing on the registry-default head shape."""
    from rtdm_tpu.models.io import infer_num_classes
    nc = infer_num_classes(variables)
    if nc and getattr(model, "num_classes", nc) != nc:
        model = model.clone(num_classes=nc)
    return model
