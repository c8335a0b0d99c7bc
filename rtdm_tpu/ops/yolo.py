"""YOLO head decode — vectorized XLA replacement for the reference's CUDA
plugin kernel (tensorrt_inference/plugins/yolo_layer.cu:203-306) and the
torch YOLOLayer (yolov3/models.py:185-258).

Semantics reproduced exactly:
- classic (models.py:252-257 / CalDetection): xy = sigmoid(t_xy)*scale_xy
  - 0.5*(scale_xy-1) + grid, wh = exp(t_wh)*anchor_px, obj/cls sigmoid,
  xy*stride into input-pixel space.
- new_coords (CalDetection_NewCoords:261-306, YOLOv4-CSP): no sigmoid on the
  raw map (network ends in logistic), xy = t_xy*scale_xy - 0.5*(scale_xy-1)
  + grid, wh = (t_wh*2)^2 * anchor_px.

Channel layout: NHWC raw map with channels = na*(5+nc), anchor-major
([x,y,w,h,obj,cls...] per anchor), matching darknet conv output.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def decode_head(p: jax.Array, anchors_px: jax.Array, img_size,
                num_classes: int, scale_x_y: float = 1.0,
                new_coords: bool = False, v5: bool = False) -> jax.Array:
    """(B, ny, nx, na*(5+nc)) raw map -> (B, na*ny*nx, 5+nc) decoded.

    `img_size` is an int (square input) or an (h, w) tuple (rectangular
    letterbox batches, datasets.py:285-316 rect mode).
    Output columns: cx, cy, w, h (input-image pixels), obj, cls...
    """
    b, ny, nx, _ = p.shape
    na = anchors_px.shape[0]
    no = num_classes + 5
    in_h, in_w = ((int(img_size), int(img_size))
                  if isinstance(img_size, (int, float))
                  else (int(img_size[0]), int(img_size[1])))
    # per-axis stride (yolo_layer.cu derives x/y scale from input w/h vs
    # yolo w/h independently); identical for the square heads every square
    # input produces, correct for ny != nx and rectangular inputs
    stride = jnp.array([in_w / nx, in_h / ny], jnp.float32)
    p = p.reshape(b, ny, nx, na, no).astype(jnp.float32)

    gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
    grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,ny,nx,1,2)
    anchors = jnp.asarray(anchors_px, jnp.float32)[None, None, None, :, :]

    txy, twh, trest = p[..., 0:2], p[..., 2:4], p[..., 4:]
    if v5:
        # ultralytics decode: xy = (2sig-0.5+grid)*stride, wh = (2sig)^2*a
        s = jax.nn.sigmoid(p)
        xy = (s[..., 0:2] * 2.0 - 0.5 + grid) * stride
        wh = jnp.square(s[..., 2:4] * 2.0) * anchors
        out = jnp.concatenate([xy, wh, s[..., 4:]], axis=-1)
        return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(
            b, na * ny * nx, no)
    if new_coords:
        xy = (txy * scale_x_y - 0.5 * (scale_x_y - 1.0) + grid) * stride
        wh = jnp.square(twh * 2.0) * anchors
        rest = trest
    else:
        xy = (jax.nn.sigmoid(txy) * scale_x_y
              - 0.5 * (scale_x_y - 1.0) + grid) * stride
        wh = jnp.exp(twh) * anchors
        rest = jax.nn.sigmoid(trest)
    out = jnp.concatenate([xy, wh, rest], axis=-1)
    # anchor-major flatten to match the torch fork's (b, na, ny, nx) order
    return jnp.transpose(out, (0, 3, 1, 2, 4)).reshape(b, na * ny * nx, no)


def decode_all(raw_maps: Sequence[jax.Array], heads, img_size
               ) -> jax.Array:
    """Concatenate decoded predictions of every head: (B, total, 5+nc).
    `img_size`: int (square) or (h, w) tuple (rect batches)."""
    decoded = [decode_head(p, h.anchors_px, img_size, h.num_classes,
                           h.scale_x_y, h.new_coords,
                           getattr(h, "v5", False))
               for p, h in zip(raw_maps, heads)]
    return jnp.concatenate(decoded, axis=1)


def raw_to_train_layout(p: jax.Array, na: int, num_classes: int) -> jax.Array:
    """(B, ny, nx, na*no) -> (B, na, ny, nx, no), the loss-side layout
    (models.py:235: p.view(bs,na,no,ny,nx).permute(0,1,3,4,2))."""
    b, ny, nx, _ = p.shape
    no = num_classes + 5
    return jnp.transpose(p.reshape(b, ny, nx, na, no), (0, 3, 1, 2, 4))
