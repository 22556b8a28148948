"""Integration: every preset builds its model/optimizer/schedule/augmentation
and completes one real train step + eval on its synthetic dataset."""

import jax
import numpy as np
import pytest

from cnn_pde_tpu.data import build_augment_fn, load_dataset
from cnn_pde_tpu.models import MODEL_REGISTRY
from cnn_pde_tpu.train import Trainer
from cnn_pde_tpu.utils.config import PRESETS, get_preset

LIGHT = ["mnist", "fashion_mnist", "svhn", "emotion", "tiny_imagenet",
         "cifar10_noconv", "cifar10_hybrid"]


@pytest.mark.parametrize("name", LIGHT)
def test_preset_one_step(name, key):
    preset = get_preset(name)
    ds = load_dataset(preset.dataset, "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=2, synthetic_test_per_class=1)
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    bs = 8
    trainer = Trainer(model,
                      preset.make_train_config(batch_size=bs, log_every=10**9),
                      preset.make_schedule(max(ds.steps_for_batch(bs), 1)),
                      augment_fn=build_augment_fn(preset.augment))
    state = trainer.init_state(key, None)
    stats = trainer.train_epoch(state, ds, 0, verbose=False)
    assert np.isfinite(stats["loss"]), name
    ev = trainer.evaluate(state, ds)
    assert 0.0 <= ev["acc"] <= 100.0
    assert ev["predictions"].shape == ev["labels"].shape


def test_all_presets_registered():
    assert set(PRESETS) == {
        "mnist", "fashion_mnist", "svhn", "cifar10_noconv", "cifar10_hybrid",
        "emotion", "tiny_imagenet",
    }
    for p in PRESETS.values():
        assert p.model in MODEL_REGISTRY
