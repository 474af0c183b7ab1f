"""Shared backend detection.

The one real TPU chip in this environment is reached through a tunnel
relay whose jax platform name is "axon", not "tpu" — every TPU/CPU
routing decision in the package must accept both (a bare ``== "tpu"``
check silently routes production traffic to the slow/fallback path on
the real chip; see ADVICE.md round 1).
"""

from __future__ import annotations

import jax

_TPU_NAMES = ("tpu", "axon")


def on_tpu() -> bool:
    """True when the default jax backend is a (possibly tunneled) TPU."""
    return jax.default_backend() in _TPU_NAMES
