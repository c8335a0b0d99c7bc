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
