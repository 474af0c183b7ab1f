"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; the runtime around it — here the
LETOR data loader — is native C++ compiled on first use with the
system toolchain (g++; pybind11 is not available in this image, so the
libraries expose a C ABI consumed through ctypes). Every native entry
point has a pure-Python fallback, so the package works without a
compiler.
"""

from ranklib_tpu.native.loader import native_parse_letor  # noqa: F401
