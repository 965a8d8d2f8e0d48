"""Global runtime configuration for perphil-tpu.

The reference stack (Firedrake/PETSc) computes everything in float64. For
numerical parity (iteration counts, condition numbers, L2 errors) we enable
JAX's x64 mode by default; set ``PERPHIL_TPU_X64=0`` before import to run in
float32 (faster on TPU MXU, looser parity).
"""

from __future__ import annotations

import os

_configured = False


def setup() -> None:
    """Configure JAX once, at package import time."""
    global _configured
    if _configured:
        return
    import jax

    if os.environ.get("PERPHIL_TPU_X64", "1") != "0":
        jax.config.update("jax_enable_x64", True)
    _configured = True


def has_tpu() -> bool:
    """True when a TPU-like accelerator backs the default JAX platform."""
    import jax

    try:
        return any(d.platform.lower() in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False


def default_dtype():
    """The working dtype: float64 in x64 mode (default), else float32."""
    import jax
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
