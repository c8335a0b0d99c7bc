"""Serving layer: micro-batching dispatch over compiled engines.

Beyond-reference component: the reference's deployment story is a local
display loop (real-time-inference.py, trt_yolo.py); production TPU serving
wants an RPC front that coalesces concurrent single-frame requests into
the engine's fixed batch shape. `MicroBatcher` is the core; `cli/serve.py`
is the stdlib-HTTP front end.
"""

from rtdm_tpu.serve.batcher import BatcherStats, MicroBatcher  # noqa: F401
