"""cnn_pde_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
the MariMamgo/CNN-with-PDE reference (PDE-evolution feature extractors in front of
MLP/CNN classifier heads, trained end-to-end).

Layering (see SURVEY.md §1):
    ops/       L1 numerical kernels (tridiagonal solves, stencils, smoothing)
    pde/       L2 PDE evolution layers (ADI diffusion, FTCS, Ruthotto blocks, ...)
    nn/        building blocks for L3 (Linear/BN/Dropout/Conv with PyTorch-parity init)
    models/    L3 classifier assemblies (one per reference script)
    data/      dataset pipelines + on-device JAX augmentation
    train/     L4 train/eval engine (optax, schedules, checkpoints, metrics)
    parallel/  device-mesh utilities: DP sharding, spatial sharding + halo exchange
    utils/     configs, stability diagnostics
"""

__version__ = "0.1.0"
