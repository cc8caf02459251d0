import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.data.synthetic import synthetic_batch
from moleculesde_tpu.finetune import (
    create_classification_state,
    create_md17_state,
    create_regression_state,
    make_classification_steps,
    make_md17_steps,
    make_regression_steps,
)
from moleculesde_tpu.finetune.regression import RegressionModel
from moleculesde_tpu.models import GNNGraphPred, SchNet
from moleculesde_tpu.utils.metrics import roc_auc_per_task
from moleculesde_tpu.utils.schedulers import PlateauController, make_lr_schedule


def test_classification_descends():
    batch = synthetic_batch(num_graphs=8, n_max=8, seed=0, num_tasks=3)
    # make labels in {-1, 0, 1}
    y = np.sign(np.asarray(batch.y))
    y[0, 0] = 0.0  # a missing label
    batch = batch.replace(y=jnp.asarray(y))
    model = GNNGraphPred(num_tasks=3, num_layers=2, emb_dim=16, drop_ratio=0.0)
    key = jax.random.PRNGKey(0)
    state, tx = create_classification_state(model, batch, key, lr=1e-2)
    train_step, eval_step = make_classification_steps(model, tx)
    gm = jnp.ones((8,), dtype=bool)
    losses = []
    for _ in range(5):
        state, loss = train_step(state, batch, key, gm, jnp.asarray(1e-2))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    pred = eval_step(state, batch)
    assert pred.shape == (8, 3)


def test_regression_descends():
    batch = synthetic_batch(num_graphs=8, n_max=8, seed=1, num_tasks=1)
    enc = SchNet(hidden_channels=16, num_filters=8, num_interactions=2,
                 num_gaussians=8)
    model = RegressionModel(encoder=enc)
    key = jax.random.PRNGKey(1)
    state, tx = create_regression_state(model, batch, key, lr=1e-2)
    train_step, eval_step = make_regression_steps(model, tx, "mae")
    y = batch.y[:, 0]
    gm = jnp.ones((8,), dtype=bool)
    losses = []
    for _ in range(5):
        state, loss = train_step(state, batch, y, gm, jnp.asarray(1e-2))
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert eval_step(state, batch).shape == (8,)


def test_md17_energy_forces_descend():
    batch = synthetic_batch(num_graphs=4, n_max=6, seed=2, num_tasks=1,
                            with_forces=True)
    enc = SchNet(hidden_channels=16, num_filters=8, num_interactions=2,
                 num_gaussians=8, cutoff=10.0)
    model = RegressionModel(encoder=enc)
    key = jax.random.PRNGKey(2)
    state, tx = create_md17_state(model, batch, key, lr=1e-2)
    train_step, eval_step = make_md17_steps(model, tx)
    y_e = batch.y[:, 0]
    y_f = batch.forces
    gm = jnp.ones((4,), dtype=bool)
    metrics_hist = []
    for _ in range(5):
        state, metrics = train_step(state, batch, y_e, y_f, gm, jnp.asarray(1e-2))
        assert np.isfinite(float(metrics["loss"]))
        metrics_hist.append(float(metrics["loss"]))
    assert metrics_hist[-1] < metrics_hist[0]
    pred_e, pred_f = eval_step(state, batch)
    assert pred_e.shape == (4,)
    assert pred_f.shape == batch.positions.shape
    # padded atoms get exactly zero force
    pad = np.asarray(pred_f)[~np.asarray(batch.node_mask)]
    np.testing.assert_allclose(pad, 0.0, atol=1e-6)


def test_roc_auc_per_task_skips_invalid():
    y = np.array([[1, 1], [-1, 1], [1, 0], [-1, 1]])
    scores = np.array([[0.9, 0.1], [0.1, 0.2], [0.8, 0.3], [0.2, 0.4]])
    aucs = roc_auc_per_task(y, scores)
    assert len(aucs) == 1  # task 1 has only positives -> skipped
    assert aucs[0] == 1.0


def test_lr_schedules():
    for name in ["CosineAnnealingLR", "CosineAnnealingWarmRestarts", "StepLR",
                  "StepLRCustomized", "ReduceLROnPlateau"]:
        s = make_lr_schedule(name, 1e-3, epochs=10, steps_per_epoch=5)
        assert s(0) > 0
        assert s(49) > 0
    cos = make_lr_schedule("CosineAnnealingLR", 1e-3, 10, 5, min_lr=1e-6)
    assert cos(50) == pytest.approx(1e-6, rel=1e-3)

    pc = PlateauController(1e-3, factor=0.5, patience=1)
    assert pc.update(1.0) == 1e-3
    assert pc.update(2.0) == 1e-3
    assert pc.update(2.0) == 5e-4  # second bad epoch triggers decay


def test_roc_auc_mean_device_matches_sklearn():
    """Device rank-sum AUC == sklearn on {-1, 0, +1} masked labels, including
    ties and missing tasks (reference finetune_MoleculeNet.py:193-210)."""
    from moleculesde_tpu.utils.metrics import roc_auc_mean_device

    rng = np.random.default_rng(0)
    y = rng.choice([-1.0, 0.0, 1.0], size=(64, 5))
    y[:, 3] = np.abs(y[:, 3])  # task with no negatives -> skipped
    s = rng.normal(size=(64, 5)).astype(np.float32)
    s[:16, 0] = 0.5  # ties
    auc_dev, n_ok = roc_auc_mean_device(jnp.asarray(y), jnp.asarray(s))
    ref = roc_auc_per_task(y, s)
    assert int(n_ok) == len(ref) == 4
    np.testing.assert_allclose(float(auc_dev), np.mean(ref), atol=1e-6)


def test_best_tracker_selects_max_and_min():
    from moleculesde_tpu.finetune.common import make_best_tracker

    init, update = make_best_tracker("max")
    payload0 = {"p": jnp.asarray([1.0, 2.0]), "aux": jnp.asarray(10.0)}
    best = update(init(payload0), jnp.asarray(0.3), payload0)
    payload1 = {"p": jnp.asarray([3.0, 4.0]), "aux": jnp.asarray(20.0)}
    best = update(best, jnp.asarray(0.7), payload1)
    payload2 = {"p": jnp.asarray([5.0, 6.0]), "aux": jnp.asarray(30.0)}
    best = update(best, jnp.asarray(0.5), payload2)
    metric, payload, epoch, _ = jax.device_get(best)
    assert float(metric) == pytest.approx(0.7)
    assert int(epoch) == 2
    np.testing.assert_allclose(payload["p"], [3.0, 4.0])

    init, update = make_best_tracker("min")
    best = update(init(payload0), jnp.asarray(5.0), payload0)
    best = update(best, jnp.asarray(2.0), payload1)
    best = update(best, jnp.asarray(3.0), payload2)
    metric, payload, epoch, _ = jax.device_get(best)
    assert -float(metric) == pytest.approx(2.0)
    assert int(epoch) == 2
    np.testing.assert_allclose(payload["aux"], 20.0)
