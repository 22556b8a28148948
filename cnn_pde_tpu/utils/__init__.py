"""Configs, diagnostics, analysis, sweeps and debugging utilities."""

from .analysis import (
    anisotropy_analysis,
    cfl_report,
    coefficient_time_evolution,
    coupling_strength,
    evaluation_summary,
)
from .config import PRESETS, Preset, get_preset
from .debug import annotate, nan_guard, profile_trace, step_timer
from .summary import format_summary, model_summary, param_group_counts
from .sweep import compare_configs, compare_spatial_discretizations, format_table

__all__ = [
    "anisotropy_analysis",
    "cfl_report",
    "coefficient_time_evolution",
    "coupling_strength",
    "evaluation_summary",
    "PRESETS",
    "Preset",
    "get_preset",
    "annotate",
    "format_summary",
    "model_summary",
    "param_group_counts",
    "nan_guard",
    "profile_trace",
    "step_timer",
    "compare_configs",
    "compare_spatial_discretizations",
    "format_table",
]
