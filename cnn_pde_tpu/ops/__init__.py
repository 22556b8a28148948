"""L1 numerical kernels: tridiagonal solves, ADI sweeps, stencils, smoothing."""

from .adi import sweep_last_axis, sweep_x, sweep_y
from .smoothing import smooth3
from .stencil import ftcs_evolve, laplacian, laplacian_step
from .tridiag import (
    thomas_solve_reference,
    tridiag_solve,
    tridiag_solve_scan,
    tridiag_solve_unrolled,
)

__all__ = [
    "sweep_last_axis",
    "sweep_x",
    "sweep_y",
    "smooth3",
    "ftcs_evolve",
    "laplacian",
    "laplacian_step",
    "thomas_solve_reference",
    "tridiag_solve",
    "tridiag_solve_scan",
    "tridiag_solve_unrolled",
]
