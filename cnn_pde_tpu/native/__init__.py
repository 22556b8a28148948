"""Native (C++) runtime components, bound via ctypes.

The compute path is JAX/XLA/Pallas (TPU); the host-side runtime around it —
here, the input-pipeline batcher — is C++ (PARITY.md "Native-code
accounting").  The library compiles on first use with the in-image g++ and
caches the .so next to the source; everything degrades gracefully to the
numpy path when a toolchain is unavailable.
"""

from .binding import NativeBatcher, native_available

__all__ = ["NativeBatcher", "native_available"]
