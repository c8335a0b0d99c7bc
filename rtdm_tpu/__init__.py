"""rtdm_tpu — TPU-native real-time disaster-management framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
qazi0/real-time-disaster-management (reference mounted at /root/reference):

- 5-class aerial disaster classification (ErNET / Squeeze_ErNET / Squeeze_RedConv
  around the ACFF block) on AIDER.
- 2-class victim localization (YOLOv3/v4-tiny via darknet cfg, YOLOv5 via yaml)
  on ODDER.
- Quantized/AOT-compiled inference engines (the TensorRT analogue on TPU):
  bf16/fp16/int8 paths built on XLA AOT compilation + calibration.
- Unified trainer, loss zoo, schedules, EMA, early stopping, Orbax checkpoints.
- Data-parallel (and wider) scaling over a `jax.sharding.Mesh` with XLA
  collectives instead of NCCL/DDP.

Layout conventions (TPU-first, not torch-translated):
- Activations are NHWC, conv kernels HWIO (XLA/TPU native).
- bfloat16 compute / float32 params by default (`core.precision`).
- Everything under `jit`; static shapes; `lax` control flow.
"""

__version__ = "0.1.0"
