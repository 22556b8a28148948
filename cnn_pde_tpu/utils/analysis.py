"""Post-training analysis — the evaluate_and_visualize family (A1-A4).

Re-implements the reference's printed diagnostics as returned data structures
(print-friendly), and optional matplotlib panels:
  * CFL stability report                       (mnist_test.py:200-219, 276-279)
  * coefficient time-evolution statistics      (mnist_test.py:381-387)
  * anisotropy analysis α/dx² vs β/dy²         (mnist_test.py:389-398)
  * per-class accuracy table                   (fashion_mnist.py:341-368)
  * channel-coupling matrix norm               (SVHN.py:401-402)
"""

from __future__ import annotations

import numpy as np

from ..train.metrics import classification_report, confusion_matrix, per_class_accuracy

__all__ = [
    "cfl_report",
    "coefficient_time_evolution",
    "anisotropy_analysis",
    "evaluation_summary",
    "coupling_strength",
    "evolution_spectrum",
    "model_evolution_spectra",
    "operator_spectrum",
]


def evolution_spectrum(layer, params, input_shape, max_dim=4096, top_k=8):
    """EXACT stability analysis of a PDE layer's trained evolution — beyond
    the reference's CFL heuristic (mnist_test.py:200-219, a sufficient
    condition for the EXPLICIT scheme that says nothing about the implicit
    ADI schemes actually used, nor about channel mixing/skip blends).

    Every PDE front-end layer is linear in u (pde/linearize.py), so the whole
    multi-step evolution IS a (D, D) matrix whose spectrum decides stability
    outright: spectral radius ≤ 1 ⟺ the trained operator is non-amplifying;
    the largest singular value bounds one-pass amplification; the eigenvalue
    near 1 is the conserved (mass-like) mode of the Neumann BC.

    ``input_shape``: (C, H, W) of the layer input.  Returns a dict with the
    spectral radius, top-|λ| eigenvalues, σ_max/σ_min, and the composed
    matrix's deviation from symmetry.  Layers with D > max_dim are refused
    (the matrix would be impractically large).
    """
    import jax
    import jax.numpy as jnp

    from ..nn.core import Ctx
    from ..pde.linearize import capture_linearized

    D = int(np.prod(input_shape))
    if D > max_dim:
        raise ValueError(f"evolution dimension {D} exceeds max_dim={max_dim}")
    with capture_linearized(max_dim=max_dim) as cap:
        @jax.jit
        def probe(p, x):
            layer.apply(p, {}, x, Ctx(train=False))
            return [m for _, m in cap.items]

        mats = probe(params, jnp.zeros((1,) + tuple(input_shape), jnp.float32))
    if not mats:
        raise ValueError("layer did not linearize (is it a PDE layer?)")
    return operator_spectrum(mats[0], top_k=top_k)


def operator_spectrum(mat, top_k=8):
    """Spectral report of one composed evolution matrix (linearize
    convention: out_flat = u_flat @ M, so the operator acting on
    column-vector states is Mᵀ — same spectrum, transposed symmetry)."""
    m = np.asarray(mat, np.float64).T
    eig = np.linalg.eigvals(m)
    order = np.argsort(-np.abs(eig))
    sv = np.linalg.svd(m, compute_uv=False)
    sym = 0.5 * (m + m.T)
    return {
        "dim": int(m.shape[0]),
        "spectral_radius": float(np.abs(eig).max()),
        # (re, im) pairs — JSON-serializable
        "top_eigenvalues": [[float(e.real), float(e.imag)]
                            for e in eig[order[:top_k]]],
        "sigma_max": float(sv[0]),
        "sigma_min": float(sv[-1]),
        "non_normality": float(np.linalg.norm(m - sym) / np.linalg.norm(m)),
        "stable": bool(np.abs(eig).max() <= 1.0 + 1e-6),
    }


def model_evolution_spectra(model, params, state, input_shape, max_dim=4096,
                            top_k=8):
    """evolution_spectrum over EVERY linearizable PDE layer reachable from a
    full model forward (the flagship's 3 multi-scale branches, the SVHN
    coupled layer, the hybrid model's two diffusion branches, ...).  Returns
    a list of (layer_class_name, spectrum_dict) in call order; layers with
    D > max_dim are skipped (e.g. Tiny-ImageNet's 12288)."""
    import jax
    import jax.numpy as jnp

    from ..nn.core import Ctx
    from ..pde.linearize import capture_linearized

    with capture_linearized(max_dim=max_dim) as cap:
        @jax.jit
        def probe(p, s, x):
            model.apply(p, s, x, Ctx(train=False))
            return [m for _, m in cap.items]

        mats = probe(params, state,
                     jnp.zeros((1,) + tuple(input_shape), jnp.float32))
    return [(type(lay).__name__, operator_spectrum(m, top_k=top_k))
            for (lay, _), m in zip(cap.items, mats)]


def cfl_report(alpha_base, alpha_time, beta_base, beta_time, *, dt, dx, dy,
               num_steps):
    """CFL-like stability check: stable iff max(coeff)·dt/dh² < 0.5."""
    horizon = dt * num_steps
    alpha_max = float(np.max(np.asarray(alpha_base)
                             + np.abs(np.asarray(alpha_time)) * horizon))
    beta_max = float(np.max(np.asarray(beta_base)
                            + np.abs(np.asarray(beta_time)) * horizon))
    cfl_x = alpha_max * dt / dx**2
    cfl_y = beta_max * dt / dy**2
    return {"cfl_x": cfl_x, "cfl_y": cfl_y,
            "stable_x": cfl_x < 0.5, "stable_y": cfl_y < 0.5,
            "dt": dt, "dx": dx, "dy": dy}


def coefficient_time_evolution(alpha_base, alpha_time, beta_base, beta_time,
                               *, dt, num_steps, points=5, eps=1e-6):
    """Coefficient statistics at `points` times across the evolution horizon."""
    rows = []
    for t in np.linspace(0.0, num_steps * dt, points):
        a = np.maximum(np.asarray(alpha_base) + np.asarray(alpha_time) * t, eps)
        b = np.maximum(np.asarray(beta_base) + np.asarray(beta_time) * t, eps)
        rows.append({"t": float(t),
                     "alpha_mean": float(a.mean()), "alpha_std": float(a.std()),
                     "beta_mean": float(b.mean()), "beta_std": float(b.std())})
    return rows


def anisotropy_analysis(alpha_final, beta_final, *, dx, dy):
    """Effective diffusion rates and anisotropy ratio (mnist_test.py:389-398)."""
    ex = np.asarray(alpha_final) / dx**2
    ey = np.asarray(beta_final) / dy**2
    return {
        "effective_x_mean": float(ex.mean()), "effective_x_std": float(ex.std()),
        "effective_y_mean": float(ey.mean()), "effective_y_std": float(ey.std()),
        "anisotropy_ratio": float(ex.mean() / ey.mean()),
    }


def coupling_strength(channel_matrix):
    """Frobenius norm of the channel coupling/mixing matrix (SVHN.py:401-402)."""
    return float(np.linalg.norm(np.asarray(channel_matrix)))


def evaluation_summary(labels, predictions, num_classes, class_names=None):
    """Accuracy + per-class accuracy + confusion matrix + full report —
    the data behind A2/A3/A4's prints and heatmaps."""
    labels = np.asarray(labels)
    predictions = np.asarray(predictions)
    return {
        "accuracy": float((labels == predictions).mean()) * 100.0,
        "per_class_accuracy": per_class_accuracy(labels, predictions,
                                                 num_classes).tolist(),
        "confusion_matrix": confusion_matrix(labels, predictions,
                                             num_classes).tolist(),
        "report": classification_report(labels, predictions, num_classes,
                                        class_names),
    }
