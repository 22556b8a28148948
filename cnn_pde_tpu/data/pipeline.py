"""Host-side batching pipeline feeding device-resident epochs.

The reference uses torch DataLoader worker processes (D1-D4).  On TPU the
right shape is: keep the (small) datasets as pinned host numpy arrays, shuffle
indices per epoch, slice fixed-shape batches (stable jit signatures), and let
augmentation happen on device inside the train step.  Eval batches normalize
on host (test transforms are deterministic: ToTensor + Normalize only).
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple

import numpy as np

__all__ = ["ArrayDataset", "balance_classes"]


def balance_classes(images, labels):
    """Truncate every class to the size of the smallest one, keeping original
    order — the EmotionDataset balancing option
    (emotion_recognition.py:131-150)."""
    labels = np.asarray(labels)
    counts = np.bincount(labels)
    min_count = counts[counts > 0].min()
    keep = np.zeros(len(labels), dtype=bool)
    seen = np.zeros(counts.shape[0], dtype=np.int64)
    for i, lab in enumerate(labels):
        if seen[lab] < min_count:
            keep[i] = True
            seen[lab] += 1
    return images[keep], labels[keep]


class ArrayDataset:
    """In-memory dataset of NCHW float32 images in [0, 1] + int labels."""

    def __init__(self, train_images, train_labels, test_images, test_labels,
                 *, mean: Optional[Sequence[float]] = None,
                 std: Optional[Sequence[float]] = None,
                 num_classes: Optional[int] = None):
        self.train_images = np.ascontiguousarray(train_images, dtype=np.float32)
        self.train_labels = np.ascontiguousarray(train_labels, dtype=np.int32)
        self.test_images = np.ascontiguousarray(test_images, dtype=np.float32)
        self.test_labels = np.ascontiguousarray(test_labels, dtype=np.int32)
        self.mean = np.asarray(mean, np.float32) if mean is not None else None
        self.std = np.asarray(std, np.float32) if std is not None else None
        self.num_classes = num_classes or int(max(train_labels.max(),
                                                  test_labels.max()) + 1)

    def _normalize(self, images):
        if self.mean is None:
            return images
        return (images - self.mean[:, None, None]) / self.std[:, None, None]

    def train_batches(self, batch_size, seed=0, native=False
                      ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Shuffled fixed-shape batches; remainder dropped (stable jit shapes).
        Raw [0,1] images — normalization happens in the on-device augment fn.

        native=True routes through the C++ prefetching batcher
        (cnn_pde_tpu.native): a producer thread gathers the next batch while
        the device executes the current step — the reference's DataLoader-
        worker role (mnist_test.py:251-258), done in-process."""
        if native:
            from ..native import NativeBatcher, native_available

            if native_available():
                yield from NativeBatcher(self.train_images, self.train_labels,
                                         batch_size, seed=seed)
                return
            # fall through to the numpy path when no toolchain is present
        n = self.train_images.shape[0]
        perm = np.random.default_rng(seed).permutation(n)
        for i in range(0, n - batch_size + 1, batch_size):
            idx = perm[i : i + batch_size]
            yield self.train_images[idx], self.train_labels[idx]

    def train_arrays(self):
        """Full raw train split, for the Trainer's device-resident epoch mode
        (TrainConfig.device_epoch): the whole split moves to HBM once and the
        epoch's shuffling/batching/augmentation all happen on device."""
        return self.train_images, self.train_labels

    def eval_arrays(self, split="test"):
        """Full normalized eval split (the deterministic test transform:
        ToTensor + Normalize), for the Trainer's device-resident eval."""
        images = self.test_images if split == "test" else self.train_images
        labels = self.test_labels if split == "test" else self.train_labels
        return self._normalize(images), labels

    def eval_batches(self, batch_size, split="test"):
        images = self.test_images if split == "test" else self.train_images
        labels = self.test_labels if split == "test" else self.train_labels
        n = images.shape[0]
        for i in range(0, n, batch_size):
            yield self._normalize(images[i : i + batch_size]), labels[i : i + batch_size]

    def steps_for_batch(self, batch_size):
        return max(self.train_images.shape[0] // batch_size, 1)
