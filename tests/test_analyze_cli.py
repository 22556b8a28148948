"""Smoke test for the analysis CLI (A1-A4 surface): runs end-to-end on the
synthetic fixture and checks the artifacts it promises (accuracy + report
print, confusion matrix, coefficient heatmaps, prediction panel, JSON)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_analyze_cli_mnist(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "cnn_pde_tpu.analyze", "--preset", "mnist",
         "--synthetic", "--output-dir", str(tmp_path), "--platform", "cpu",
         "--spectrum"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Test Accuracy:" in out.stdout
    assert "CFL:" in out.stdout          # P1 per-pixel fields present
    assert "Anisotropy ratio:" in out.stdout
    assert "spectral radius" in out.stdout  # --spectrum exact stability
    for suffix in ("confusion.png", "coefficients.png", "predictions.png",
                   "panel.png", "report.json"):
        path = tmp_path / f"mnist_{suffix}"
        assert path.exists() and path.stat().st_size > 0, suffix
    report = json.loads((tmp_path / "mnist_report.json").read_text())
    assert "accuracy" in report and "cfl" in report and "anisotropy" in report
    spec = report["evolution_spectrum"]
    assert spec["dim"] == 784 and spec["stable"]
    # Neumann BC: the constant mode is exactly conserved, so the spectral
    # radius of the implicit diffusion evolution is 1 (to f32 composition)
    assert abs(spec["spectral_radius"] - 1.0) < 1e-3


def test_analyze_cli_svhn_mega_panel(tmp_path):
    """A3 surface: per-class accuracy bars + the 7×8 mega-panel
    (channel-wise coefficient maps, coupling-matrix heatmap,
    SVHN.py:447-584)."""
    out = subprocess.run(
        [sys.executable, "-m", "cnn_pde_tpu.analyze", "--preset", "svhn",
         "--synthetic", "--output-dir", str(tmp_path), "--platform", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    for suffix in ("confusion.png", "per_class_acc.png", "panel.png",
                   "predictions.png", "report.json"):
        path = tmp_path / f"svhn_{suffix}"
        assert path.exists() and path.stat().st_size > 0, suffix
    report = json.loads((tmp_path / "svhn_report.json").read_text())
    assert len(report["per_class_accuracy"]) == 10


def test_analyze_cli_fashion_mega_panel(tmp_path):
    """A2 surface: the 6×8 panel with final/time coefficient heatmaps
    (fashion_mnist.py:370-442)."""
    out = subprocess.run(
        [sys.executable, "-m", "cnn_pde_tpu.analyze", "--preset",
         "fashion_mnist", "--synthetic", "--output-dir", str(tmp_path),
         "--platform", "cpu"],
        cwd=REPO, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    for suffix in ("per_class_acc.png", "panel.png"):
        path = tmp_path / f"fashion_mnist_{suffix}"
        assert path.exists() and path.stat().st_size > 0, suffix
