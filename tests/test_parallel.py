"""Explicit-SPMD tests on the 8-device virtual mesh: comms wrappers,
shard_map train step vs GSPMD equivalence, halo-exchange conv parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rtdm_tpu.core.mesh import create_mesh
from rtdm_tpu.core.precision import FP32_POLICY
from rtdm_tpu.models import create_model
from rtdm_tpu.parallel.comms import (
    all_gather_along,
    broadcast_from,
    pmean_grads,
    shard_batch,
)
from rtdm_tpu.parallel.shard import (
    make_shard_map_train_step,
    spatial_shard_conv,
)
from rtdm_tpu.train.losses import make_classification_loss
from rtdm_tpu.train.schedules import make_optimizer
from rtdm_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def mesh8():
    return create_mesh((8,), ("data",))


def test_comms_wrappers(mesh8):
    def body(x):
        summed = jax.lax.psum(x, "data")
        avg = pmean_grads(x, "data")
        gathered = all_gather_along(x, "data")
        bcast = broadcast_from(x, "data", src=3)
        return summed, avg, gathered, bcast

    x = jnp.arange(8, dtype=jnp.float32)
    mapped = jax.shard_map(body, mesh=mesh8, in_specs=P("data"),
                       out_specs=(P("data"), P("data"), P("data"), P("data")),
                       check_vma=False)
    s, a, g, b = jax.jit(mapped)(x)
    np.testing.assert_allclose(np.asarray(s), np.full(8, 28.0))
    np.testing.assert_allclose(np.asarray(a), np.full(8, 3.5))
    np.testing.assert_allclose(np.asarray(g)[:8], np.arange(8))
    np.testing.assert_allclose(np.asarray(b), np.full(8, 3.0))


def test_shard_batch_places_on_mesh(mesh8):
    batch = {"x": np.zeros((16, 4), np.float32)}
    out = shard_batch(batch, mesh8)
    assert out["x"].sharding.spec == P("data")


def test_shard_map_step_matches_gspmd(mesh8):
    """Explicit shard_map step (pmean grads + sync BN) == GSPMD step."""
    loss_fn = make_classification_loss("crossentropy")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 140, 140, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (8,)), jnp.int32)

    # dropout off: per-shard vs global dropout masks cannot agree, and the
    # point here is the collective structure (grads pmean + sync BN)
    model_g = create_model("squeeze-ernet", dropout_rate=0.0)
    tx = make_optimizer("sgd", 0.01, grad_clip=None)
    tr = Trainer(model_g, tx, loss_fn, policy=FP32_POLICY, mesh=mesh8)
    state = tr.init_state(jax.random.key(0), (1, 140, 140, 3))
    state, metrics = tr.train_step(state, x, y, jax.random.key(1))
    want_params = jax.device_get(state.params)
    want_stats = jax.device_get(state.batch_stats)

    # explicit shard_map with sync-BN
    model_s = create_model("squeeze-ernet", bn_axis="data",
                           dropout_rate=0.0)
    tx2 = make_optimizer("sgd", 0.01, grad_clip=None)
    variables = model_s.init(jax.random.key(0),
                             jnp.zeros((1, 140, 140, 3)))
    params, stats = variables["params"], variables["batch_stats"]
    opt_state = tx2.init(params)
    step = make_shard_map_train_step(model_s, tx2, loss_fn, mesh8)
    params2, stats2, _, loss2 = step(params, stats, opt_state,
                                     shard_batch(x, mesh8),
                                     shard_batch(y, mesh8),
                                     jax.random.key(1))
    got_params = jax.device_get(params2)
    got_stats = jax.device_get(stats2)
    for a, b in zip(jax.tree_util.tree_leaves(want_params),
                    jax.tree_util.tree_leaves(got_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # sync-BN: running stats match the global-batch stats of GSPMD
    for a, b in zip(jax.tree_util.tree_leaves(want_stats),
                    jax.tree_util.tree_leaves(got_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(loss2), float(metrics["loss"]),
                               rtol=1e-4)


def test_spatial_shard_conv_parity(mesh8):
    """H-sharded halo-exchange conv == plain conv2d."""
    from rtdm_tpu.ops.convpool import conv2d

    mesh = create_mesh((8,), ("spatial",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)) * 0.1, jnp.float32)
    want = conv2d(x, k, padding=1)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
    got = spatial_shard_conv(xs, k, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_data_parallel_engine_matches_single_device(mesh8):
    """A mesh-compiled classifier engine (batch sharded over 8 devices,
    GSPMD placement) must produce the single-device engine's outputs —
    multi-chip serving with zero numerics drift."""
    from rtdm_tpu.export.engine import Engine, EngineSpec

    model = create_model("squeeze-ernet")
    size = model.image_size
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, size, size, 3), jnp.float32))
    spec = EngineSpec(model="squeeze-ernet", quant="fp32", batch_size=16,
                      image_size=size)
    frames = np.random.default_rng(0).integers(
        0, 255, (16, size, size, 3)).astype(np.uint8)
    single = Engine(spec, variables)(frames)
    sharded = Engine(spec, variables, mesh=mesh8)(frames)
    np.testing.assert_allclose(sharded, single, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="divide"):
        Engine(EngineSpec(model="squeeze-ernet", quant="fp32",
                          batch_size=12, image_size=size),
               variables, mesh=mesh8)


def test_data_parallel_detector_matches_single_device(mesh8):
    """Mesh-compiled detector engine == single-device engine, including
    the NMS stage (each shard suppresses its own frames locally)."""
    from tests.conftest import REFERENCE_ROOT, reference_available
    if not reference_available():
        pytest.skip("reference not mounted")
    from rtdm_tpu.export.detector import (DetectorSpec, Detector,
                                          load_detection_model)

    cfg = str(REFERENCE_ROOT /
              "code/victim_localization/yolov3/cfg/yolov3-tiny-aider-416.cfg")
    model, variables, heads = load_detection_model(cfg, None, 224)
    spec = DetectorSpec(cfg_name="tiny", img_size=224, conf_thres=0.3,
                        quant="fp32")
    frames = np.random.default_rng(1).integers(
        0, 255, (8, 224, 224, 3)).astype(np.uint8)
    d1, c1 = Detector(model, variables, spec, batch_size=8, heads=heads)(
        frames)
    d2, c2 = Detector(model, variables, spec, batch_size=8, heads=heads,
                      mesh=mesh8)(frames)
    np.testing.assert_array_equal(c1, c2)
    # the two programs tile convs differently -> ~1e-6 relative fp32
    # rounding on raw logits; same boxes, sub-0.01px coordinates
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-2)


def test_spatial_shard_conv_degenerate_kernels(mesh8):
    """halo=0 (1-row kernels) and non-square kernels: the halo follows kH
    and the horizontal SAME padding follows kW."""
    from rtdm_tpu.ops.convpool import conv2d
    from rtdm_tpu.parallel.shard import spatial_shard_conv

    mesh = create_mesh((8,), ("spatial",))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 8)), jnp.float32)
    for kh, kw in ((1, 1), (1, 3), (3, 1), (5, 3)):
        k = jnp.asarray(rng.normal(size=(kh, kw, 8, 4)) * 0.1, jnp.float32)
        want = conv2d(x, k, padding=(kh // 2, kw // 2))
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
        got = spatial_shard_conv(xs, k, mesh)
        assert got.shape == want.shape, (kh, kw, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"k=({kh},{kw})")


def test_yolo_dp_train_step_matches_single_device(mesh8):
    """One detector TRAIN step (darknet graph + yolo loss + sgd) over the
    8-device data-parallel mesh == the same step jitted on one device with
    identical inputs: loss and updated params agree to fp32 tolerance.
    This is the DDP-training-equivalence proof for the detector path
    (reference: yolov3/train.py:169-170 grad allreduce), complementing the
    classifier shard_map/GSPMD test and the driver dryrun's compile leg."""
    import optax

    from rtdm_tpu.export.detector import model_heads
    from rtdm_tpu.models.darknet import Darknet
    from rtdm_tpu.train.yolo_loss import YoloHyp, yolo_loss

    cfg = """
[net]
width=64
height=64
[convolutional]
batch_normalize=1
filters=16
size=3
stride=2
pad=1
activation=leaky
[convolutional]
batch_normalize=1
filters=32
size=3
stride=2
pad=1
activation=leaky
[convolutional]
size=1
stride=1
pad=1
filters=21
activation=linear
[yolo]
mask = 0,1,2
anchors = 10,13,  16,30,  33,23
classes=2
num=3
"""
    model = Darknet(cfg_text=cfg)
    img = 64
    variables = model.init(jax.random.key(0), jnp.zeros((1, img, img, 3)))
    heads = model_heads(model, variables)
    tx = optax.sgd(0.01, momentum=0.9)
    params = variables["params"]
    stats = variables["batch_stats"]
    opt_state = tx.init(params)
    hyp = YoloHyp()

    def step(params, stats, opt_state, images, labels, nlab):
        def loss_of(p):
            raw, mutated = model.apply(
                {"params": p, "batch_stats": stats},
                images / 255.0, train=True, mutable=["batch_stats"])
            loss, _ = yolo_loss(raw, heads, labels, nlab, img, hyp)
            return loss, mutated["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats2, loss

    rng = np.random.default_rng(3)
    bsz = 16
    images = jnp.asarray(rng.integers(0, 255, (bsz, img, img, 3)),
                         jnp.float32)
    labels = np.zeros((bsz, 4, 5), np.float32)
    labels[:, 0] = [1, 32, 32, 16, 16]
    labels[::2, 1] = [0, 20, 20, 10, 12]
    nlab = np.where(np.arange(bsz) % 2 == 0, 2, 1).astype(np.int32)
    nlab_j = jnp.asarray(nlab)
    labels_j = jnp.asarray(labels)

    p1, s1, l1 = jax.jit(step)(params, stats, opt_state, images, labels_j,
                               nlab_j)

    repl = NamedSharding(mesh8, P())
    dsh = NamedSharding(mesh8, P("data"))
    jit_dp = jax.jit(step, in_shardings=(repl, repl, repl, dsh, dsh, dsh),
                     out_shardings=(repl, repl, repl))
    p8, s8, l8 = jit_dp(params, stats, opt_state,
                        jax.device_put(images, dsh),
                        jax.device_put(labels_j, dsh),
                        jax.device_put(nlab_j, dsh))

    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-5)
    key = lambda kv: str(kv[0])
    for (k1, a), (k8, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p1), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(p8), key=key)):
        assert k1 == k8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=str(k1))
    # BN batch statistics are GLOBAL-batch under GSPMD == single device
    for (k1, a), (k8, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(s1), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(s8), key=key)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6, err_msg=str(k1))


# ---------------------------------------------------------------------------
# distributed_init: real two-process rendezvous on CPU (Gloo collectives) —
# the TPU-world analogue of the reference's NCCL TCP rendezvous
# (yolov3/train.py:159-168). Each child runs ONE local CPU device; after
# distributed_init, jax.device_count() must be global (2) and a psum must
# cross the process boundary.
# ---------------------------------------------------------------------------

_DIST_CHILD = r"""
import os, sys
mode, pid, nproc, addr = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), \
    sys.argv[4]
if mode == "env":
    os.environ["JAX_COORDINATOR_ADDRESS"] = addr
    os.environ["NUM_PROCESSES"] = str(nproc)
    os.environ["PROCESS_ID"] = str(pid)
from rtdm_tpu.core.mesh import create_mesh, distributed_init
if mode == "env":
    distributed_init()
else:
    distributed_init(coordinator_address=addr, num_processes=nproc,
                     process_id=pid)
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid, jax.process_index()
assert jax.device_count() == nproc, jax.device_count()
assert len(jax.local_devices()) == 1
mesh = create_mesh()
local = np.full((1,), float(pid + 1), np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local)
f = jax.jit(jax.shard_map(lambda x: jax.lax.psum(x, "data"), mesh=mesh,
                          in_specs=P("data"), out_specs=P()))
out = np.asarray(jax.device_get(f(garr)))
assert out[0] == sum(range(1, nproc + 1)), out
print(f"DIST_OK {mode} {pid}", flush=True)
"""


@pytest.mark.parametrize("mode", ["args", "env"])
def test_distributed_init_two_process(mode, tmp_path):
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PALLAS_AXON_POOL_IPS": "",  # never touch the TPU tunnel
           "PYTHONPATH": "/root/repo"}
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "NUM_PROCESSES", "PROCESS_ID"):
        env.pop(k, None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _DIST_CHILD, mode, str(i), "2", addr],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, cwd="/root/repo") for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"DIST_OK {mode} {i}" in out
