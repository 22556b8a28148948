"""Visualization panels (sideband B) — headless matplotlib (Agg) versions of
the reference's plt.show() figures, written to PNG files:

  * sample grid with predictions + after-PDE images  (mnist_test.py:400-444)
  * coefficient-field heatmaps                       (mnist_test.py:426-440)
  * confusion-matrix heatmap                         (emotion_recognition.py:253-261)
  * training curves                                  (emotion_recognition.py:376-389)
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_prediction_panel", "save_coefficient_heatmaps",
           "save_confusion_matrix", "save_training_curves"]


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def save_prediction_panel(path, images, labels, predictions, diffused=None,
                          n=6, class_names=None):
    """Rows: original+true, original+pred (green/red), after-PDE."""
    plt = _plt()
    n = min(n, images.shape[0])
    rows = 3 if diffused is not None else 2
    fig, axes = plt.subplots(rows, n, figsize=(2.2 * n, 2.2 * rows))
    axes = np.atleast_2d(axes)
    name = (lambda i: class_names[i]) if class_names else str
    for i in range(n):
        img = np.asarray(images[i]).transpose(1, 2, 0).squeeze()
        axes[0, i].imshow(img, cmap="gray")
        axes[0, i].set_title(f"True: {name(int(labels[i]))}", fontsize=8)
        axes[1, i].imshow(img, cmap="gray")
        ok = int(predictions[i]) == int(labels[i])
        axes[1, i].set_title(f"Pred: {name(int(predictions[i]))}",
                             color="green" if ok else "red", fontsize=8)
        if diffused is not None:
            dimg = np.asarray(diffused[i]).transpose(1, 2, 0).squeeze()
            axes[2, i].imshow(dimg, cmap="gray")
            axes[2, i].set_title("After PDE", fontsize=8)
        for r in range(rows):
            axes[r, i].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_coefficient_heatmaps(path, named_fields):
    """named_fields: list of (title, 2-D array) — RdBu_r heatmaps with
    colorbars (mnist_test.py:426-440)."""
    plt = _plt()
    n = len(named_fields)
    fig, axes = plt.subplots(1, n, figsize=(3.2 * n, 3.2))
    axes = np.atleast_1d(axes)
    for ax, (title, field) in zip(axes, named_fields):
        im = ax.imshow(np.asarray(field), cmap="RdBu_r")
        fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_confusion_matrix(path, cm, class_names=None):
    plt = _plt()
    cm = np.asarray(cm)
    fig, ax = plt.subplots(figsize=(8, 6))
    im = ax.imshow(cm, cmap="Blues")
    fig.colorbar(im, ax=ax)
    ticks = class_names or [str(i) for i in range(cm.shape[0])]
    if len(ticks) <= 20:
        ax.set_xticks(range(len(ticks)), ticks, rotation=45, fontsize=7)
        ax.set_yticks(range(len(ticks)), ticks, fontsize=7)
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                        fontsize=6)
    ax.set_xlabel("Predicted Label")
    ax.set_ylabel("True Label")
    ax.set_title("Confusion Matrix")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_training_curves(path, losses, accuracies):
    plt = _plt()
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    ax1.plot(losses)
    ax1.set_title("Training Loss")
    ax1.set_xlabel("Epoch")
    ax1.set_ylabel("Loss")
    ax2.plot(accuracies)
    ax2.set_title("Training Accuracy")
    ax2.set_xlabel("Epoch")
    ax2.set_ylabel("Accuracy (%)")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
