"""Evaluation + analysis CLI — the evaluate_and_visualize driver (A1-A4).

    python -m cnn_pde_tpu.analyze --preset mnist [--checkpoint-dir ckpt]
        [--synthetic] [--output-dir reports]

Produces what the reference prints/plots per script (mnist_test.py:348-444,
SVHN.py:409-584, emotion_recognition.py:229-263):
  * test accuracy, per-class accuracy, classification report
  * CFL stability + coefficient time-evolution + anisotropy analysis
    (when the model's PDE layer carries per-pixel fields)
  * confusion-matrix heatmap, prediction panel with after-PDE images,
    coefficient heatmaps — written as PNGs
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

# display class names per dataset (fashion_mnist.py:10-14,
# emotion_recognition.py:100-103; digit/object datasets use index labels)
_CLASS_NAMES = {
    "fashion_mnist": ["T-shirt/top", "Trouser", "Pullover", "Dress", "Coat",
                      "Sandal", "Shirt", "Sneaker", "Bag", "Ankle boot"],
    "emotion": ["angry", "disgust", "fear", "happy", "sad", "surprise",
                "neutral"],
    "cifar10": ["plane", "car", "bird", "cat", "deer", "dog", "frog",
                "horse", "ship", "truck"],
}


def main():
    ap = argparse.ArgumentParser(description="cnn_pde_tpu analyzer")
    ap.add_argument("--preset", required=True)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-dir", default="./data")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--output-dir", default="reports")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu); see train CLI")
    ap.add_argument("--spectrum", action="store_true",
                    help="exact stability analysis: eigen/singular spectrum "
                         "of the composed evolution operator (the PDE layer "
                         "is linear in u — utils.analysis.evolution_spectrum;"
                         " goes beyond the reference's CFL heuristic)")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from .data import load_dataset
    from .data.real import NORMALIZATION as _NORM
    from .models import MODEL_REGISTRY
    from .nn import Ctx
    from .train import Trainer, restore_state
    from .train.metrics import format_report
    from .utils.analysis import (
        anisotropy_analysis,
        cfl_report,
        coefficient_time_evolution,
        evaluation_summary,
    )
    from .utils.config import get_preset
    from .utils.viz import (
        save_coefficient_heatmaps,
        save_confusion_matrix,
        save_fashion_panel,
        save_mnist_panel,
        save_per_class_accuracy_bars,
        save_prediction_panel,
        save_svhn_panel,
    )

    preset = get_preset(args.preset)
    dataset = load_dataset(
        preset.dataset,
        "/nonexistent" if args.synthetic else args.data_dir,
        synthetic_ok=True)
    model = MODEL_REGISTRY[preset.model](**preset.model_kwargs)
    trainer = Trainer(model, preset.make_train_config(),
                      preset.make_schedule(100))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), None)
    if args.checkpoint_dir:
        restore_state(state, args.checkpoint_dir, tag="best")
        print(f"Restored best checkpoint (step {state.step})")

    ev = trainer.evaluate(state, dataset)
    summary = evaluation_summary(ev["labels"], ev["predictions"],
                                 dataset.num_classes)
    print(f"Test Accuracy: {summary['accuracy']:.2f}%")
    print(format_report(summary["report"]))

    os.makedirs(args.output_dir, exist_ok=True)
    out = {"accuracy": summary["accuracy"]}

    save_confusion_matrix(
        os.path.join(args.output_dir, f"{preset.name}_confusion.png"),
        summary["confusion_matrix"])

    # per-class accuracy bars (SVHN.py:563-578; the A2 per-class table's
    # graphical counterpart, fashion_mnist.py:341-368)
    cm = np.asarray(summary["confusion_matrix"], dtype=float)
    per_class = 100.0 * np.diag(cm) / np.maximum(cm.sum(axis=1), 1.0)
    class_names = _CLASS_NAMES.get(preset.dataset)
    save_per_class_accuracy_bars(
        os.path.join(args.output_dir, f"{preset.name}_per_class_acc.png"),
        per_class, class_names)
    out["per_class_accuracy"] = [round(float(a), 2) for a in per_class]

    # PDE-layer analysis when per-pixel fields exist (P1/P2 family)
    diff_params = state.params.get("diff")
    pde = getattr(model, "pde", None)
    if diff_params is not None and "alpha_base" in diff_params \
            and hasattr(pde, "dt") and hasattr(pde, "num_steps") \
            and np.asarray(diff_params["alpha_base"]).ndim == 2:
        dt, steps = pde.dt, pde.num_steps
        dxv = getattr(pde, "dx", 1.0)
        dyv = getattr(pde, "dy", 1.0)
        cfl = cfl_report(diff_params["alpha_base"],
                         diff_params["alpha_time_coeff"],
                         diff_params["beta_base"],
                         diff_params["beta_time_coeff"],
                         dt=dt, dx=dxv, dy=dyv, num_steps=steps)
        print(f"CFL: x={cfl['cfl_x']:.4f} {'✓' if cfl['stable_x'] else '⚠'} "
              f"y={cfl['cfl_y']:.4f} {'✓' if cfl['stable_y'] else '⚠'}")
        evo = coefficient_time_evolution(
            diff_params["alpha_base"], diff_params["alpha_time_coeff"],
            diff_params["beta_base"], diff_params["beta_time_coeff"],
            dt=dt, num_steps=steps)
        for row in evo:
            print(f"t={row['t']:.3f}: α={row['alpha_mean']:.3f}"
                  f"±{row['alpha_std']:.3f} β={row['beta_mean']:.3f}"
                  f"±{row['beta_std']:.3f}")
        t_final = steps * dt
        alpha_f = np.maximum(np.asarray(diff_params["alpha_base"])
                             + np.asarray(diff_params["alpha_time_coeff"]) * t_final,
                             1e-6)
        beta_f = np.maximum(np.asarray(diff_params["beta_base"])
                            + np.asarray(diff_params["beta_time_coeff"]) * t_final,
                            1e-6)
        aniso = anisotropy_analysis(alpha_f, beta_f, dx=dxv, dy=dyv)
        print(f"Anisotropy ratio: {aniso['anisotropy_ratio']:.3f}")
        out["cfl"] = cfl
        out["anisotropy"] = aniso
        save_coefficient_heatmaps(
            os.path.join(args.output_dir, f"{preset.name}_coefficients.png"),
            [("Final Alpha", alpha_f), ("Final Beta", beta_f),
             ("Alpha Time Coeff", np.asarray(diff_params["alpha_time_coeff"])),
             ("Beta Time Coeff", np.asarray(diff_params["beta_time_coeff"]))])

    # exact spectral stability of every trained evolution operator (opt-in:
    # dense (D,D) eigs on the host; D = C·H·W of each PDE layer's input)
    if args.spectrum:
        from .utils.analysis import model_evolution_spectra

        spectra = model_evolution_spectra(
            model, state.params, state.model_state,
            dataset.test_images.shape[1:])
        if not spectra:
            print("spectrum: no linearizable PDE layer ≤ max_dim "
                  "(tiny_imagenet's D=12288 operator is skipped by size)")
        for i, (cls, spec) in enumerate(spectra):
            lam = spec["top_eigenvalues"][0]
            print(f"Evolution operator {i} ({cls}, D={spec['dim']}): "
                  f"spectral radius {spec['spectral_radius']:.6f} "
                  f"{'✓ non-amplifying' if spec['stable'] else '⚠ AMPLIFYING'}"
                  f", σ_max={spec['sigma_max']:.4f}, "
                  f"λ₁={lam[0]:.4f}{lam[1]:+.4f}i")
        out["evolution_spectra"] = [
            {"layer": cls, **spec} for cls, spec in spectra]
        if spectra:
            out["evolution_spectrum"] = spectra[0][1]  # back-compat alias

    # prediction panel with after-PDE images for PDE-front-end models
    n_vis = min(8, dataset.test_images.shape[0])
    images = dataset.test_images[:n_vis]
    vis_labels = dataset.test_labels[:n_vis]
    norm_images = next(dataset.eval_batches(n_vis))[0]
    logits, _ = model(state.params, state.model_state, jnp.asarray(norm_images))
    preds = np.asarray(jnp.argmax(logits, -1))
    diffused = None
    if pde is not None and "diff" in state.params:
        d_out, _ = pde.apply(state.params["diff"], state.model_state.get("diff", {}),
                             jnp.asarray(norm_images), Ctx(train=False))
        diffused = np.asarray(d_out)
        # denormalize for display, as the reference does (SVHN.py:461-464,
        # fashion_mnist.py:421-423)
        mean, std = _NORM.get(preset.dataset, (None, None))
        if mean is not None:
            shape = (1, -1, 1, 1)
            diffused = np.clip(
                diffused * np.reshape(std, shape) + np.reshape(mean, shape),
                0.0, 1.0)
    save_prediction_panel(
        os.path.join(args.output_dir, f"{preset.name}_predictions.png"),
        images, vis_labels, preds, diffused=diffused)

    # A2/A3 mega-panels (fashion_mnist.py:396-441, SVHN.py:483-580)
    if diffused is not None and diff_params is not None \
            and "alpha_time_coeff" in diff_params:
        t_final = pde.num_steps * pde.dt
        alpha_f = np.maximum(
            np.asarray(diff_params["alpha_base"])
            + np.asarray(diff_params["alpha_time_coeff"]) * t_final, 1e-6)
        beta_f = np.maximum(
            np.asarray(diff_params["beta_base"])
            + np.asarray(diff_params["beta_time_coeff"]) * t_final, 1e-6)
        if preset.dataset == "mnist" and alpha_f.ndim == 2:
            save_mnist_panel(
                os.path.join(args.output_dir, f"{preset.name}_panel.png"),
                images, vis_labels, preds, diffused, alpha_f, beta_f,
                np.asarray(diff_params["alpha_time_coeff"]),
                np.asarray(diff_params["beta_time_coeff"]),
                dx=getattr(pde, "dx", 1.0), dy=getattr(pde, "dy", 1.0))
        if preset.dataset == "fashion_mnist" and alpha_f.ndim == 2:
            save_fashion_panel(
                os.path.join(args.output_dir, f"{preset.name}_panel.png"),
                images, vis_labels, preds, diffused, alpha_f, beta_f,
                np.asarray(diff_params["alpha_time_coeff"]),
                np.asarray(diff_params["beta_time_coeff"]),
                class_names=class_names)
        if "channel_coupling" in diff_params and alpha_f.ndim == 3:
            save_svhn_panel(
                os.path.join(args.output_dir, f"{preset.name}_panel.png"),
                images, vis_labels, preds, diffused, alpha_f, beta_f,
                np.asarray(diff_params["channel_coupling"]),
                np.asarray(diff_params["alpha_time_coeff"]).mean(axis=(1, 2)),
                summary["confusion_matrix"], per_class,
                class_names=class_names)

    with open(os.path.join(args.output_dir, f"{preset.name}_report.json"),
              "w") as f:
        json.dump(out, f, indent=2, default=float)
    print(f"Artifacts written to {args.output_dir}/")


if __name__ == "__main__":
    main()
