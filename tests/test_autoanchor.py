"""Autoanchor + EMA tests."""

import numpy as np
import pytest

from rtdm_tpu.train.autoanchor import (
    anchor_fitness,
    best_possible_recall,
    check_anchors,
    kmean_anchors,
)


@pytest.fixture
def clustered_wh(rng):
    """Three tight wh clusters — ideal anchors are their centers."""
    centers = np.array([[10, 12], [40, 30], [120, 100]], np.float32)
    return np.concatenate([
        c * rng.uniform(0.9, 1.1, (200, 2)) for c in centers
    ]).astype(np.float32)


def test_kmeans_recovers_clusters(clustered_wh):
    k = kmean_anchors(clustered_wh, n=3, img_size=416, gen=200, seed=0)
    assert k.shape == (3, 2)
    # sorted by area: each anchor lands near a cluster center
    want = np.array([[10, 12], [40, 30], [120, 100]])
    assert np.all(np.abs(k - want) / want < 0.25)
    assert best_possible_recall(k, clustered_wh) > 0.99


def test_fitness_ordering(clustered_wh):
    good = np.array([[10, 12], [40, 30], [120, 100]], np.float32)
    bad = np.array([[1, 1], [2, 2], [3, 3]], np.float32)
    assert anchor_fitness(good, clustered_wh) > anchor_fitness(bad,
                                                               clustered_wh)


def test_check_anchors_keeps_good_set(clustered_wh):
    class FakeDs:
        labels = [np.concatenate([np.zeros((len(clustered_wh), 1)),
                                  np.zeros((len(clustered_wh), 2)),
                                  clustered_wh / 416], axis=1)]

        def __len__(self):
            return 1

    good = np.array([[[10, 12], [40, 30], [120, 100]]], np.float32)
    out, bpr, evolved = check_anchors(FakeDs(), good, 416)
    assert not evolved and bpr > 0.98
    np.testing.assert_array_equal(out, good)

    bad = np.array([[[1, 1], [2, 2], [3, 3]]], np.float32)
    out2, bpr2, evolved2 = check_anchors(FakeDs(), bad, 416, gen=100)
    assert evolved2
    assert best_possible_recall(out2.reshape(-1, 2), clustered_wh) > bpr2 * 0 \
        and best_possible_recall(out2.reshape(-1, 2), clustered_wh) > 0.9


def test_ema_ramp():
    import jax.numpy as jnp
    from rtdm_tpu.train.ema import ema_init, ema_update

    ema = ema_init({"w": jnp.zeros(3)})
    new = {"w": jnp.ones(3)}
    e1 = ema_update(ema, new, jnp.asarray(0))
    # near step 0 the ramp makes decay ~0 -> EMA jumps almost to new value
    assert float(e1["w"][0]) > 0.99
    e2 = ema_update(ema, new, jnp.asarray(100_000))
    # late in training decay ~0.9999 -> tiny step
    assert float(e2["w"][0]) < 0.01


def test_collect_label_wh_letterboxes_nonsquare(tmp_path):
    """Non-square frames scale label wh by ONE per-image gain to the
    letterboxed shape (v5 autoanchor.py:27-29 `imgsz*shapes/shapes.max`),
    not independently per axis to a square."""
    from PIL import Image

    from rtdm_tpu.train.autoanchor import collect_label_wh

    p = tmp_path / "wide.jpg"
    Image.new("RGB", (200, 100)).save(p)  # w=200, h=100

    class Ds:
        image_paths = [str(p)]
        labels = [np.array([[0, 0.5, 0.5, 0.1, 0.1]], np.float32)]

        def __len__(self):
            return 1

    wh = collect_label_wh(Ds(), 416, jitter=False)
    # letterboxed shape: 416 * (200,100)/200 = (416, 208)
    np.testing.assert_allclose(wh[0], [41.6, 20.8], rtol=1e-5)


def test_plateau_scaler_min_lr_is_lr_floor():
    """torch ReduceLROnPlateau semantics: min_lr floors the LR itself
    (base_lr * scale >= min_lr) and improvement is relative (1e-4)."""
    from rtdm_tpu.train.schedules import PlateauScaler

    ps = PlateauScaler(factor=0.1, patience=0, min_lr=1e-4, base_lr=1e-3)
    scale = 1.0
    for _ in range(10):  # stagnant metric -> repeated reductions
        scale = ps.update(1.0)
    assert 1e-3 * scale == pytest.approx(1e-4)  # floored at min_lr, not below
    # relative threshold: a 1e-8 wiggle is NOT an improvement
    ps2 = PlateauScaler(factor=0.1, patience=0, base_lr=1.0)
    ps2.update(1.0)
    assert ps2.update(1.0 - 1e-8) < 1.0  # still counts as stale -> reduce


def test_kmeans_degenerate_wh_still_returns_n_anchors():
    """All-identical (or near-identical) label sizes: scipy kmeans drops
    empty clusters and whitening can divide by a 0 std — kmean_anchors
    must still return (n, 2) finite anchors via the Lloyd's fallback."""
    from rtdm_tpu.train.autoanchor import kmean_anchors
    wh = np.full((50, 2), 37.0, np.float32)  # zero variance both dims
    k = kmean_anchors(wh, n=6, img_size=416, gen=50)
    assert k.shape == (6, 2)
    assert np.isfinite(k).all()
    wh2 = np.concatenate([np.full((40, 2), 20.0, np.float32),
                          np.full((10, 2), 21.0, np.float32)])  # 2 clusters
    k2 = kmean_anchors(wh2, n=9, img_size=416, gen=50)
    assert k2.shape == (9, 2) and np.isfinite(k2).all()


def test_scale_v5_gains_matches_reference_formula():
    """yolov5/train.py:225-227: box *= 3/nl, cls *= nc/80*3/nl,
    obj *= (imgsz/640)^2*3/nl."""
    from rtdm_tpu.train.yolo_loss import YoloHypV5, scale_v5_gains
    hyp = scale_v5_gains(YoloHypV5(), nl=3, nc=2, img_size=416)
    np.testing.assert_allclose(hyp.box, 0.05)
    np.testing.assert_allclose(hyp.cls, 0.5 * 2 / 80.0)
    np.testing.assert_allclose(hyp.obj, (416 / 640.0) ** 2)
    hyp2 = scale_v5_gains(YoloHypV5(), nl=2, nc=80, img_size=640)
    np.testing.assert_allclose(hyp2.box, 0.05 * 1.5)
    np.testing.assert_allclose(hyp2.cls, 0.5 * 1.5)
    np.testing.assert_allclose(hyp2.obj, 1.5)


def test_mutation_factors_symmetric_around_one():
    """Genetic mutation uses ZERO-mean noise (autoanchor.py:150-152:
    randn*s+1), so factors fall on both sides of 1 — evolution must be
    able to SHRINK anchors, not only grow them."""
    from rtdm_tpu.train.autoanchor import _mutation

    rng = np.random.default_rng(0)
    draws = np.stack([_mutation(rng, (9, 2)) for _ in range(200)])
    mutated = draws[draws != 1.0]
    frac_below = (mutated < 1.0).mean()
    assert 0.3 < frac_below < 0.7, frac_below
    assert draws.min() >= 0.3 and draws.max() <= 3.0
