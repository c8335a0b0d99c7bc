"""Evolution kernel (rtdm_tpu/train/evolve.py) vs the reference's
method-3 mutation + weighted parent selection (yolov5/train.py:583-612,
yolov3/train.py:444-491, yolov5/utils/general.py:603-627).

The mutation oracle below transcribes the reference's numpy expression
verbatim (same kernel, legacy np.random API) and compares full factor
DISTRIBUTIONS, not just moments."""

import numpy as np
import pytest

from rtdm_tpu.train.evolve import (N_RESULT_COLS, EvolveLog, V3_EVOLVE_META,
                                   V5_EVOLVE_META, fitness, mutate,
                                   select_parent)


def _reference_mutation_factors(g, mp, s, n_draws, seed):
    """yolov5/train.py:598-604 verbatim (legacy RandomState API):
    v = (g * (rand(ng)<mp) * randn(ng) * rand() * s + 1).clip(0.3, 3.0)."""
    npr = np.random.RandomState(seed)
    ng = len(g)
    out = []
    for _ in range(n_draws):
        v = np.ones(ng)
        while all(v == 1):
            v = ((g * (npr.random(ng) < mp) * npr.randn(ng)
                  * npr.random() * s + 1).clip(0.3, 3.0))
        out.append(v)
    return np.array(out)


def _ours_mutation_factors(meta, mp, s, n_draws, seed):
    rng = np.random.default_rng(seed)
    parent = {k: 1.0 for k in meta}  # unit parent -> child IS the factor
    return np.array([[mutate(parent, meta, rng, mp=mp, s=s)[k]
                      for k in meta] for _ in range(n_draws)])


@pytest.mark.parametrize("mp", [0.8, 0.9])
def test_mutation_factor_distribution_matches_reference(mp):
    meta = {"a": (1, 0.0, 10.0), "b": (1, 0.0, 10.0),
            "mom": (0.1, 0.0, 10.0), "frozen": (0, 0.0, 10.0),
            "c": (1, 0.0, 10.0)}
    g = np.array([v[0] for v in meta.values()], float)
    ref = _reference_mutation_factors(g, mp, 0.2, 4000, seed=0)
    ours = _ours_mutation_factors(meta, mp, 0.2, 4000, seed=1)
    # ours rounds to 5 decimals — distribution-level comparison only
    # frozen gene (gain 0) never changes
    assert np.all(ref[:, 3] == 1.0) and np.all(ours[:, 3] == 1.0)
    # per-gene change probability ~ mp for gain-1 genes, both sides
    for col in (0, 1, 4):
        assert abs((ref[:, col] != 1).mean() - mp) < 0.03
        assert abs((ours[:, col] != 1).mean() - mp) < 0.03
    # clip band
    for x in (ref, ours):
        assert x.min() >= 0.3 - 1e-9 and x.max() <= 3.0 + 1e-9
    # the gain-0.1 gene mutates with ~10x smaller spread than gain-1
    for x in (ref, ours):
        s_mom = np.std(x[:, 2][x[:, 2] != 1])
        s_a = np.std(x[:, 0][x[:, 0] != 1])
        assert s_mom < s_a * 0.35
    # full-distribution agreement on the headline gain-1 gene
    # (two-sample Kolmogorov-Smirnov, coarse: max CDF gap)
    qs = np.linspace(0.02, 0.98, 49)
    gap = np.abs(np.quantile(ref[:, 0], qs) - np.quantile(ours[:, 0], qs))
    assert gap.max() < 0.05, f"factor distributions diverge: {gap.max()}"


def test_mutate_clips_and_rounds():
    meta = {"x": (1, 0.5, 1.2), "y": (1, 0.0, 100.0)}
    rng = np.random.default_rng(0)
    for _ in range(200):
        child = mutate({"x": 1.0, "y": 3.0}, meta, rng)
        assert 0.5 <= child["x"] <= 1.2
        assert child["y"] == round(child["y"], 5)


def test_mutate_always_changes_something():
    meta = {"x": (1, 0.0, 10.0)}
    rng = np.random.default_rng(2)
    # even with low mp, the re-draw loop guarantees a change
    for _ in range(50):
        assert mutate({"x": 1.0}, meta, rng, mp=0.05)["x"] != 1.0


def _rows(fits):
    """evolve.txt-shaped rows with mAP@0.5:0.95 = desired fitness/0.9."""
    rows = np.zeros((len(fits), N_RESULT_COLS + 2))
    rows[:, 3] = np.asarray(fits) / 0.9
    rows[:, N_RESULT_COLS] = np.arange(len(fits))  # gene0 = row id
    rows[:, N_RESULT_COLS + 1] = 7.0
    return rows


def test_select_parent_weighted_single():
    """'single' draws from the top n=5 with p ~ fitness - min(top5)."""
    rows = _rows([0.9, 0.5, 0.3, 0.2, 0.1, 0.05, 0.8])
    rng = np.random.default_rng(0)
    picks = np.array([select_parent(rows, rng)[N_RESULT_COLS]
                      for _ in range(6000)])
    # rows 5 (0.05) never picked: outside top-5 by fitness
    assert not np.any(picks == 5)
    # weights among top5 {0:0.9,6:0.8,1:0.5,2:0.3,3:0.2} minus min(0.2):
    # {0:0.7, 6:0.6, 1:0.3, 2:0.1, 3:0}
    freq = {int(i): (picks == i).mean() for i in (0, 6, 1, 2, 3)}
    assert freq[3] == 0.0  # the min-fitness top-5 row has weight 0
    w = {0: 0.7, 6: 0.6, 1: 0.3, 2: 0.1}
    tot = sum(w.values())
    for i, wi in w.items():
        assert abs(freq[i] - wi / tot) < 0.03, (i, freq)


def test_select_parent_weighted_blend():
    rows = _rows([0.9, 0.45])
    rng = np.random.default_rng(0)
    blend = select_parent(rows, rng, parent="weighted")
    # weights: [0.45, 0] after min-subtraction -> pure best row
    assert blend[N_RESULT_COLS] == rows[0, N_RESULT_COLS]


def test_select_parent_all_tied_degrades_to_uniform():
    rows = _rows([0.5, 0.5, 0.5])
    rng = np.random.default_rng(0)
    picks = {int(select_parent(rows, rng)[N_RESULT_COLS])
             for _ in range(100)}
    assert picks == {0, 1, 2}  # reference's random.choices would raise


def test_evolve_log_sorted_unique_and_yaml(tmp_path):
    meta = {"lr0": (1, 1e-5, 0.1), "mosaic": (1, 0.0, 1.0)}
    log = EvolveLog(str(tmp_path / "evolve.txt"), meta)
    log.append({"lr0": 0.01, "mosaic": 1.0}, [0.1, 0.2, 0.3, 0.4, 1, 2, 3])
    log.append({"lr0": 0.02, "mosaic": 0.5}, [0.5, 0.6, 0.9, 0.8, 1, 2, 3])
    log.append({"lr0": 0.01, "mosaic": 1.0},
               [0.1, 0.2, 0.3, 0.4, 1, 2, 3])  # duplicate row
    rows = log.load()
    assert rows.shape == (2, N_RESULT_COLS + 2)  # deduped
    f = fitness(rows)
    assert np.all(np.diff(f) <= 0)  # sorted descending
    assert log.best() == {"lr0": 0.02, "mosaic": 0.5}
    yml = tmp_path / "hyp_evolved.yaml"
    log.save_yaml(str(yml))
    import yaml
    text = yml.read_text()
    assert text.startswith("# Hyperparameter Evolution Results")
    got = yaml.safe_load(text)
    assert got == {"lr0": 0.02, "mosaic": 0.5}


def test_evolve_log_full_width_values_stay_separated(tmp_path):
    """A 10-char %10.5g value (e.g. 2.7554e-07) fills its whole field;
    without an explicit separator it merges with the next column and
    np.loadtxt dies with a changed-column-count ValueError — hit live at
    evolve gen 1 when near-zero metrics landed in e-notation."""
    meta = {"lr0": (1, 1e-5, 0.1), "mosaic": (1, 0.0, 1.0)}
    log = EvolveLog(str(tmp_path / "evolve.txt"), meta)
    tiny = [3.3113e-05, 0.0023148, 2.7554e-07, 6.5291e-05, 2.2, 8.2, 8.1]
    log.append({"lr0": 8.4e-05, "mosaic": 1.0}, tiny)
    log.append({"lr0": 0.01, "mosaic": 0.5}, [0.5, 0.6, 0.9, 0.8, 1, 2, 3])
    rows = log.load()
    assert rows.shape == (2, N_RESULT_COLS + 2)
    np.testing.assert_allclose(
        rows[np.argmin(rows[:, 2]), :4], tiny[:4], rtol=1e-4)


def test_genomes_cover_trainer_surface():
    """Every v5 gene must be either a trainer flag or a consumed hyp-yaml
    key; genome order is stable (evolve.txt schema)."""
    from rtdm_tpu.cli.yolo_train import (V3_GENE_DEFAULTS, V3_GENE_FLAGS,
                                         V5_GENE_DEFAULTS, V5_GENE_FLAGS)

    assert set(V3_EVOLVE_META) == set(V3_GENE_DEFAULTS)
    assert set(V5_EVOLVE_META) == set(V5_GENE_DEFAULTS)
    assert set(V3_GENE_FLAGS) <= set(V3_EVOLVE_META)
    assert set(V5_GENE_FLAGS) <= set(V5_EVOLVE_META)
    # reference gene order preserved (yolov3/train.py:27-44)
    assert list(V3_EVOLVE_META)[:6] == ["giou", "cls", "cls_pw", "obj",
                                        "obj_pw", "iou_t"]
