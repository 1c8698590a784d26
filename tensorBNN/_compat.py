"""Shared shim helpers: dtype translation and warm-start plumbing."""

from __future__ import annotations

import numpy as np


def to_jnp_dtype(dtype):
    """Maps TF dtype objects / numpy dtypes / strings to a jnp dtype."""
    import jax.numpy as jnp

    if dtype is None:
        return jnp.float32
    name = getattr(dtype, "name", None) or str(dtype)
    if "float64" in name:
        return jnp.float32  # x64 is disabled by default in JAX; closest
    if "float16" in name or "bfloat16" in name:
        return jnp.bfloat16 if "b" in name else jnp.float32
    return jnp.float32


def ref_dense_warm_start(weights, biases):
    """Converts reference-layout (W: (out, in), b: (out, 1)) starts into the
    framework's params override dict."""
    out = {}
    if weights is not None:
        out["w"] = np.asarray(weights).T
    if biases is not None:
        out["b"] = np.asarray(biases).reshape(-1)
    return out or None
