"""Configs and diagnostics."""

from .config import PRESETS, Preset, get_preset

__all__ = ["PRESETS", "Preset", "get_preset"]
