"""Interoperability with the PyTorch reference: checkpoint import."""

from .torch_import import (TORCH_KEY_REWRITES, export_state_dict,
                           import_state_dict, load_torch_checkpoint)

__all__ = ["TORCH_KEY_REWRITES", "export_state_dict", "import_state_dict",
           "load_torch_checkpoint"]
