"""Native C++ prefetching batcher tests (builds with the in-image g++)."""

import numpy as np
import pytest

from cnn_pde_tpu.native import NativeBatcher, native_available

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C++ toolchain")


def make_data(n=100, shape=(1, 8, 8)):
    images = np.arange(n * int(np.prod(shape)), dtype=np.float32)
    images = images.reshape((n,) + shape)
    labels = np.arange(n, dtype=np.int32)
    return images, labels


def test_covers_epoch_without_duplicates():
    images, labels = make_data(100)
    seen = []
    for imgs, labs in NativeBatcher(images, labels, batch_size=16, seed=0):
        assert imgs.shape == (16, 1, 8, 8)
        # image content must match its label's source row
        for k in range(16):
            np.testing.assert_array_equal(imgs[k], images[labs[k]])
        seen.extend(labs.tolist())
    assert len(seen) == 96          # 100 // 16 * 16, remainder dropped
    assert len(set(seen)) == 96     # no duplicates
    assert seen != sorted(seen)     # actually shuffled


def test_deterministic_by_seed():
    images, labels = make_data(64)
    run1 = [l for _, labs in NativeBatcher(images, labels, 8, seed=7)
            for l in labs]
    run2 = [l for _, labs in NativeBatcher(images, labels, 8, seed=7)
            for l in labs]
    run3 = [l for _, labs in NativeBatcher(images, labels, 8, seed=8)
            for l in labs]
    assert run1 == run2
    assert run1 != run3


def test_dataset_native_path():
    from cnn_pde_tpu.data import load_dataset

    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=10, synthetic_test_per_class=2)
    native_batches = list(ds.train_batches(32, seed=0, native=True))
    numpy_batches = list(ds.train_batches(32, seed=0))
    assert len(native_batches) == len(numpy_batches)
    for imgs, labs in native_batches:
        assert imgs.shape == numpy_batches[0][0].shape
        assert labs.min() >= 0 and labs.max() < ds.num_classes
    # per-class balance survives the shuffle+drop (10 per class, drop ≤ bs)
    counts = np.bincount(np.concatenate([b[1] for b in native_batches]),
                         minlength=10)
    assert counts.sum() == 32 * len(native_batches)
