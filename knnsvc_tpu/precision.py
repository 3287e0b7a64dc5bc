"""Global numeric-precision policy.

TPU MXUs default to bf16 matmul/conv inputs (~1e-2 relative error), which is
fine for throughput mode but breaks the <=1e-3 waveform-parity target vs the
fp32 PyTorch reference (BASELINE.md). Models read the active policy at trace
time; switch with `set_precision("fastest")` for bf16-speed inference or
keep the default "highest" for parity-grade fp32.
"""

from __future__ import annotations

import jax

_PRECISION = jax.lax.Precision.HIGHEST

_NAMES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "fastest": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
}


def set_precision(name: str) -> None:
    """Switch the policy. Clears jit caches on change — traced executables
    bake the precision in, so stale caches would silently keep the old one."""
    global _PRECISION
    new = _NAMES[name]
    if new is not _PRECISION:
        _PRECISION = new
        jax.clear_caches()
        try:
            from knnsvc_tpu.models.wavlm.model import _POS_BIAS_CACHE

            _POS_BIAS_CACHE.clear()
        except ImportError:
            pass


def get_precision() -> jax.lax.Precision:
    return _PRECISION
