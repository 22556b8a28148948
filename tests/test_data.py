"""Data pipeline + augmentation tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cnn_pde_tpu.data import (
    ArrayDataset,
    AugmentSpec,
    build_augment_fn,
    load_dataset,
    make_synthetic,
)
from cnn_pde_tpu.train.metrics import (
    classification_report,
    confusion_matrix,
    per_class_accuracy,
)


def test_synthetic_determinism_and_shapes():
    a = make_synthetic("cifar10", train_per_class=3, test_per_class=2)
    b = make_synthetic("cifar10", train_per_class=3, test_per_class=2)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert a[0].shape == (30, 3, 32, 32)
    assert a[0].min() >= 0.0 and a[0].max() <= 1.0
    assert set(np.unique(a[1])) == set(range(10))


def test_synthetic_tiny_imagenet_200_classes():
    xs, ys, xt, yt = make_synthetic("tiny_imagenet", train_per_class=1,
                                    test_per_class=1)
    assert xs.shape == (200, 3, 64, 64)
    assert len(np.unique(ys)) == 200


def test_dataset_batching_fixed_shapes():
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True,
                      synthetic_train_per_class=7, synthetic_test_per_class=3)
    shapes = {b[0].shape for b in ds.train_batches(16, seed=0)}
    assert shapes == {(16, 1, 28, 28)}
    total = sum(b[1].shape[0] for b in ds.eval_batches(16))
    assert total == ds.test_images.shape[0]


def test_train_shuffle_differs_by_seed():
    ds = load_dataset("mnist", "/nonexistent", synthetic_ok=True)
    b0 = next(iter(ds.train_batches(32, seed=0)))[1]
    b1 = next(iter(ds.train_batches(32, seed=1)))[1]
    assert not np.array_equal(b0, b1)


def test_augment_pipeline_preserves_shape_and_range(key):
    spec = AugmentSpec(crop_padding=4, hflip=0.5, rotation=10.0,
                       brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1,
                       erasing_p=0.5,
                       mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    fn = build_augment_fn(spec)
    batch = jnp.asarray(np.random.default_rng(0).random((8, 3, 32, 32),
                                                        ).astype(np.float32))
    out = fn(key, batch)
    assert out.shape == batch.shape
    assert np.isfinite(np.asarray(out)).all()
    # normalized range: (x - .5)/.25 ∈ [-2, 2]
    assert np.asarray(out).min() >= -2.001 and np.asarray(out).max() <= 2.001
    # deterministic per rng
    out2 = fn(key, batch)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different rng → different augmentation
    out3 = fn(jax.random.PRNGKey(99), batch)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_augment_hflip_statistics(key):
    spec = AugmentSpec(hflip=1.0)
    fn = build_augment_fn(spec)
    batch = jnp.asarray(np.arange(2 * 1 * 4 * 4, dtype=np.float32)
                        .reshape(2, 1, 4, 4) / 32.0)
    out = np.asarray(fn(key, batch))
    np.testing.assert_allclose(out, np.asarray(batch)[:, :, :, ::-1])


def test_augment_inside_jit(key):
    fn = build_augment_fn(AugmentSpec(rotation=5.0, translate=0.05))
    batch = jnp.ones((4, 1, 28, 28))

    @jax.jit
    def step(rng, b):
        return fn(rng, b).sum()

    v = step(key, batch)
    assert np.isfinite(float(v))


def test_metrics():
    labels = np.array([0, 0, 1, 1, 2, 2])
    preds = np.array([0, 1, 1, 1, 2, 0])
    cm = confusion_matrix(labels, preds, 3)
    assert cm[0, 0] == 1 and cm[0, 1] == 1 and cm[2, 0] == 1
    acc = per_class_accuracy(labels, preds, 3)
    np.testing.assert_allclose(acc, [0.5, 1.0, 0.5])
    rep = classification_report(labels, preds, 3)
    assert abs(rep["accuracy"] - 4 / 6) < 1e-9
    assert rep["1"]["recall"] == 1.0


def test_tiny_imagenet_disk_fixture_and_folder_loader(tmp_path):
    """Write the reference's on-disk layout (tiny_imagenet.py:350-391) and
    load it back through the real folder-loading path."""
    from cnn_pde_tpu.data import write_synthetic_tiny_imagenet

    write_synthetic_tiny_imagenet(str(tmp_path), num_classes=5,
                                  train_per_class=3, val_total=10)
    ds = load_dataset("tiny_imagenet", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (15, 3, 64, 64)
    assert ds.test_images.shape == (10, 3, 64, 64)
    assert set(np.unique(ds.train_labels)) == set(range(5))
    # val_annotations mapping is respected: label i%5 for the i-th val image
    assert ds.test_labels.tolist() == [i % 5 for i in range(10)]


def test_real_loader_mnist_idx(tmp_path, rng):
    """Write a tiny idx-format MNIST and load it through the real path."""
    import gzip
    import struct

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)

    def write_images(name, arr):
        with open(raw / name, "wb") as f:
            f.write(struct.pack(">IIII", 2051, *arr.shape))
            f.write(arr.tobytes())

    def write_labels(name, arr):
        with open(raw / name, "wb") as f:
            f.write(struct.pack(">II", 2049, arr.shape[0]))
            f.write(arr.tobytes())

    xs = (rng.random((10, 28, 28)) * 255).astype(np.uint8)
    ys = rng.integers(0, 10, 10).astype(np.uint8)
    write_images("train-images-idx3-ubyte", xs)
    write_labels("train-labels-idx1-ubyte", ys)
    write_images("t10k-images-idx3-ubyte", xs[:4])
    write_labels("t10k-labels-idx1-ubyte", ys[:4])

    ds = load_dataset("mnist", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (10, 1, 28, 28)
    np.testing.assert_allclose(ds.train_images[0, 0],
                               xs[0].astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ds.train_labels, ys.astype(np.int32))


def test_real_loader_cifar10_pickle(tmp_path):
    """Write tiny files in the exact torchvision CIFAR-10 on-disk format
    (cifar-10-batches-py/{data_batch_1..5, test_batch}: pickled dicts of
    uint8 (N, 3072) row-major-CHW 'data' + int list 'labels'; the real files
    are Python-2 pickles whose str keys decode to BYTES under the loader's
    encoding='bytes' — cifar10.py:365-397) and load them through the real
    path (data/real.py::_load_cifar10)."""
    import pickle

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()

    def write(name, n, seed):
        g = np.random.default_rng(seed)
        data = (g.random((n, 3072)) * 255).astype(np.uint8)
        labels = [int(v) for v in g.integers(0, 10, n)]
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        return data, labels

    train = [write(f"data_batch_{i}", 4, i) for i in range(1, 6)]
    test_data, test_labels = write("test_batch", 6, 99)

    ds = load_dataset("cifar10", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (20, 3, 32, 32)
    assert ds.test_images.shape == (6, 3, 32, 32)
    # the 3072 vector unflattens row-major to (C, H, W): a pointwise probe
    # (channel 2, row 5, col 7 == flat index 2*1024 + 5*32 + 7)
    np.testing.assert_allclose(
        float(ds.train_images[0, 2, 5, 7]),
        train[0][0][0, 2 * 1024 + 5 * 32 + 7] / 255.0)
    np.testing.assert_allclose(
        ds.train_images[0],
        train[0][0][0].reshape(3, 32, 32).astype(np.float32) / 255.0)
    # all five batches concatenate in order; test_batch stands alone
    np.testing.assert_array_equal(
        ds.train_labels,
        np.concatenate([np.asarray(l, np.int32) for _, l in train]))
    np.testing.assert_allclose(
        ds.test_images[-1],
        test_data[-1].reshape(3, 32, 32).astype(np.float32) / 255.0)
    np.testing.assert_array_equal(ds.test_labels,
                                  np.asarray(test_labels, np.int32))


def test_real_loader_svhn_mat(tmp_path):
    """Write tiny {train,test}_32x32.mat files in the exact SVHN format
    (X: uint8 (32, 32, 3, N) HWCN; y: (N, 1) with labels 1..10 where 10
    means digit 0 — the torchvision convention, SVHN.py:274-297) and load
    them through the real path (data/real.py::_load_svhn)."""
    from scipy.io import savemat

    def write(split, n, seed):
        g = np.random.default_rng(seed)
        X = (g.random((32, 32, 3, n)) * 255).astype(np.uint8)
        y = g.integers(1, 11, (n, 1)).astype(np.uint8)
        y[0, 0] = 10  # guarantee the 10→0 remap path is exercised
        savemat(tmp_path / f"{split}_32x32.mat", {"X": X, "y": y})
        return X, y

    Xtr, ytr = write("train", 8, 0)
    Xte, yte = write("test", 5, 1)

    ds = load_dataset("svhn", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (8, 3, 32, 32)
    assert ds.test_images.shape == (5, 3, 32, 32)
    # HWCN → NCHW: pointwise probe (image 2, channel 1, row 5, col 7)
    np.testing.assert_allclose(float(ds.train_images[2, 1, 5, 7]),
                               Xtr[5, 7, 1, 2] / 255.0)
    np.testing.assert_allclose(
        ds.train_images[2],
        Xtr[:, :, :, 2].transpose(2, 0, 1).astype(np.float32) / 255.0)
    # the torchvision label convention: 10 → 0, everything else unchanged
    exp = ytr.reshape(-1).astype(np.int32)
    exp[exp == 10] = 0
    np.testing.assert_array_equal(ds.train_labels, exp)
    assert ds.train_labels[0] == 0
    assert ds.train_labels.min() >= 0 and ds.train_labels.max() <= 9
    exp_t = yte.reshape(-1).astype(np.int32)
    exp_t[exp_t == 10] = 0
    np.testing.assert_array_equal(ds.test_labels, exp_t)


def test_emotion_8020_fallback_split(tmp_path):
    """When the validation folder is absent the emotion loader must fall
    back to an 80/20 train split (emotion_recognition.py:304-311)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for ci, cname in enumerate(["angry", "happy"]):
        cdir = tmp_path / "images" / "train" / cname
        cdir.mkdir(parents=True)
        for j in range(10):
            arr = (rng.random((48, 48)) * 255).astype(np.uint8)
            Image.fromarray(arr, mode="L").save(cdir / f"{j}.png")

    ds = load_dataset("emotion", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (16, 1, 48, 48)   # 80% of 20
    assert ds.test_images.shape == (4, 1, 48, 48)     # 20% of 20
    # split is a permutation: train/test pixels are disjoint images
    tr = {ds.train_images[i].tobytes() for i in range(16)}
    te = {ds.test_images[i].tobytes() for i in range(4)}
    assert not tr & te and len(tr) == 16

    # with a real validation folder present, no split happens
    vdir = tmp_path / "images" / "validation" / "angry"
    vdir.mkdir(parents=True)
    arr = (rng.random((48, 48)) * 255).astype(np.uint8)
    Image.fromarray(arr, mode="L").save(vdir / "v.png")
    ds2 = load_dataset("emotion", str(tmp_path))
    assert ds2.train_images.shape == (20, 1, 48, 48)
    assert ds2.test_images.shape == (1, 1, 48, 48)


def test_fetch_helper(tmp_path, monkeypatch, capsys):
    """data.fetch: presence detection, offline degradation to a layout doc,
    the no-URL (kaggle) path, and a simulated successful download."""
    from cnn_pde_tpu.data import fetch as F

    # offline (no egress here): must degrade to the layout doc, not raise
    monkeypatch.setattr(F, "_download",
                        lambda *a, **k: (_ for _ in ()).throw(OSError("no net")))
    assert F.fetch("svhn", str(tmp_path)) == "unavailable"
    out = capsys.readouterr().out
    assert "train,test}_32x32.mat" in out and "--synthetic" in out

    # emotion has no direct URL: instructions, not an attempt
    assert F.fetch("emotion", str(tmp_path)) == "unavailable"
    assert "kagglehub" in capsys.readouterr().out

    # simulated successful download lands the exact load_dataset layout
    def fake_download(url, dest, timeout=30.0):
        import os
        os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
        with open(dest, "wb") as f:
            f.write(b"stub")
    monkeypatch.setattr(F, "_download", fake_download)
    assert F.fetch("svhn", str(tmp_path)) == "downloaded"
    assert (tmp_path / "train_32x32.mat").exists()
    assert F.fetch("svhn", str(tmp_path)) == "present"

    # --layout prints every dataset's expected path, offline-safe
    assert F.main(["--layout", "--data-dir", str(tmp_path)]) == 0
    out = capsys.readouterr().out
    for name in ("MNIST/raw", "cifar-10-batches-py", "tiny-imagenet-200"):
        assert name in out


def test_tiny_imagenet_corrupt_file_fallback(tmp_path):
    """Unreadable tiny-imagenet files must yield the reference's
    deterministic per-index synthetic image (tiny_imagenet.py:497-504)
    instead of raising."""
    from cnn_pde_tpu.data import write_synthetic_tiny_imagenet
    from cnn_pde_tpu.data.real import _tiny_fallback_image

    write_synthetic_tiny_imagenet(str(tmp_path), num_classes=3,
                                  train_per_class=2, val_total=3)
    # corrupt the first image of the first class (sorted order)
    base = tmp_path / "tiny-imagenet-200" / "train"
    cname = sorted(p.name for p in base.iterdir())[0]
    victim = sorted((base / cname / "images").iterdir())[0]
    victim.write_bytes(b"not a jpeg")

    ds = load_dataset("tiny_imagenet", str(tmp_path))
    assert ds.source == "real"
    assert ds.train_images.shape == (6, 3, 64, 64)
    # the corrupt slot carries the deterministic fallback (idx=0, class=0)
    np.testing.assert_allclose(ds.train_images[0],
                               _tiny_fallback_image(0, 0))
    # other images loaded normally (not equal to any fallback pattern)
    assert not np.allclose(ds.train_images[1], _tiny_fallback_image(1, 0))
