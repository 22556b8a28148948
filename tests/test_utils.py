"""Analysis / viz / sweep / debug utility tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.utils import (
    anisotropy_analysis,
    cfl_report,
    coefficient_time_evolution,
    compare_configs,
    coupling_strength,
    evaluation_summary,
    format_table,
    nan_guard,
    step_timer,
)
from cnn_pde_tpu.utils.viz import (
    save_coefficient_heatmaps,
    save_confusion_matrix,
    save_prediction_panel,
    save_training_curves,
)


def test_cfl_report():
    r = cfl_report(np.full((4, 4), 2.0), np.zeros((4, 4)),
                   np.full((4, 4), 2.0), np.zeros((4, 4)),
                   dt=0.001, dx=1.0, dy=1.0, num_steps=10)
    assert abs(r["cfl_x"] - 0.002) < 1e-9 and r["stable_x"]
    r2 = cfl_report(np.full((4, 4), 600.0), np.zeros((4, 4)),
                    np.full((4, 4), 2.0), np.zeros((4, 4)),
                    dt=0.001, dx=1.0, dy=1.0, num_steps=10)
    assert not r2["stable_x"] and r2["stable_y"]


def test_coefficient_evolution_and_anisotropy():
    rows = coefficient_time_evolution(
        np.ones((3, 3)), np.ones((3, 3)) * 0.5,
        np.ones((3, 3)) * 2, np.zeros((3, 3)),
        dt=0.1, num_steps=10, points=3)
    assert rows[0]["alpha_mean"] == pytest.approx(1.0)
    assert rows[-1]["alpha_mean"] == pytest.approx(1.5)
    an = anisotropy_analysis(np.ones((3, 3)) * 2, np.ones((3, 3)),
                             dx=1.0, dy=0.5)
    assert an["anisotropy_ratio"] == pytest.approx(0.5)
    assert coupling_strength(np.eye(3)) == pytest.approx(np.sqrt(3))


def test_evaluation_summary():
    s = evaluation_summary([0, 1, 1, 2], [0, 1, 0, 2], 3)
    assert s["accuracy"] == pytest.approx(75.0)
    assert s["per_class_accuracy"][1] == pytest.approx(0.5)


def test_viz_panels(tmp_path, rng):
    imgs = rng.random((6, 1, 28, 28)).astype(np.float32)
    labels = np.arange(6)
    preds = np.array([0, 1, 2, 0, 4, 5])
    p1 = save_prediction_panel(str(tmp_path / "panel.png"), imgs, labels,
                               preds, diffused=imgs)
    p2 = save_coefficient_heatmaps(str(tmp_path / "coef.png"),
                                   [("alpha", rng.random((28, 28))),
                                    ("beta", rng.random((28, 28)))])
    p3 = save_confusion_matrix(str(tmp_path / "cm.png"),
                               np.eye(7, dtype=int) * 5)
    p4 = save_training_curves(str(tmp_path / "curves.png"),
                              [2.0, 1.0, 0.5], [30, 60, 80])
    for p in (p1, p2, p3, p4):
        assert os.path.getsize(p) > 1000


def test_compare_configs_isolates_failures():
    def run_one(cfg):
        if cfg.get("boom"):
            raise RuntimeError("kaboom")
        return 42.0

    res = compare_configs(run_one, [{"a": 1}, {"boom": True}])
    assert res[0]["accuracy"] == 42.0
    assert res[1]["accuracy"] == 0.0
    assert "42.00%" in format_table(res)


def test_nan_guard():
    def f(x):
        return jnp.log(x)

    guarded = jax.jit(nan_guard(f))
    err, out = guarded(jnp.asarray([1.0, 2.0]))
    err.throw()  # clean
    err, out = guarded(jnp.asarray([-1.0, 2.0]))
    with pytest.raises(Exception):
        err.throw()


def test_step_timer():
    t = step_timer()
    with t.measure():
        pass
    assert t.mean_ms >= 0.0


def test_model_summary_flagship():
    """Shape-only summary: totals must equal a real init's tree_size, the
    PDE-group split must cover the optimizer-group surfaces, and eval_shape
    must not have materialized any weights (it's instant)."""
    from cnn_pde_tpu.models import CIFAR10PDENoConv
    from cnn_pde_tpu.nn.core import tree_size
    from cnn_pde_tpu.utils.summary import format_summary, model_summary

    model = CIFAR10PDENoConv()
    s = model_summary(model, (2, 3, 32, 32))
    params, _ = model.init(jax.random.PRNGKey(0))
    assert s["total_params"] == tree_size(params)
    assert s["output_shape"] == (2, 10)
    assert {"alpha", "beta", "channel_mixing"} <= set(s["pde_groups"])
    assert s["pde_params"] == sum(s["pde_groups"].values())
    assert sum(n for _, n in s["subtrees"]) == s["total_params"]
    txt = format_summary(s)
    assert "total" in txt and f"{s['total_params']:,}" in txt


def test_model_summary_hybrid_counts_ruthotto_K():
    """The hybrid model's Ruthotto .K weight matrices are grouped PDE
    params (the optimizer selects them by '.K.'), dominating its total."""
    from cnn_pde_tpu.models import CIFAR10HybridPDEModel
    from cnn_pde_tpu.utils.summary import model_summary

    s = model_summary(CIFAR10HybridPDEModel(), (2, 3, 32, 32))
    assert s["pde_groups"][".K."] > 1_000_000
    assert s["pde_params"] > 0.5 * s["total_params"]
