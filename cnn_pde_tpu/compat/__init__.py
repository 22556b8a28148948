"""Interoperability with the PyTorch reference: checkpoint import."""

from .torch_import import (TORCH_KEY_REWRITES, import_state_dict,
                           load_torch_checkpoint)

__all__ = ["TORCH_KEY_REWRITES", "import_state_dict",
           "load_torch_checkpoint"]
