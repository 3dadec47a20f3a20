"""Random-init primitives + fast host dtype casts.

Init runs ON DEVICE inside one jitted program (loader.init_random): this host
has a single CPU core that the accelerator-runtime background threads starve,
so host-side generation of a 0.6B model takes minutes while the device does
it in milliseconds (and the compiled init program is persistently cached).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def normal(key: jax.Array, shape, scale: float = 1.0, dtype=jnp.float32):
    return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)


def fast_astype(arr: np.ndarray, dtype) -> np.ndarray:
    """Host dtype cast avoiding ml_dtypes' generic element loop:
    f32→bf16 via vectorized round-to-nearest-even bit twiddling."""
    np_dtype = np.dtype(dtype)
    if arr.dtype == np_dtype:
        return arr
    if arr.dtype == np.float32 and np_dtype.name == "bfloat16":
        u = arr.view(np.uint32)
        rounded = u + np.uint32(0x7FFF) + ((u >> np.uint32(16)) & np.uint32(1))
        out = (rounded >> np.uint32(16)).astype(np.uint16)
        # NaN guard: the rounding add can overflow a NaN mantissa into the
        # exponent (NaN -> Inf).  Pass NaNs through truncated instead
        # (keeps them NaN; payload truncation matches ml_dtypes).
        is_nan = (u & np.uint32(0x7F800000)) == np.uint32(0x7F800000)
        is_nan &= (u & np.uint32(0x007FFFFF)) != 0
        if is_nan.any():
            trunc = (u >> np.uint32(16)).astype(np.uint16)
            out = np.where(is_nan, trunc | np.uint16(0x0040), out)
        return out.view(np_dtype)
    return arr.astype(np_dtype)
