"""Shim for ``tensorBNN.network`` (and ``networkFinal``): the reference's
``network(dtype, inputDims, trainX, trainY, validateX, validateY)`` object
with camelCase ``setupMCMC``/``train`` kwargs (reference network.py:19-26,
193-198, 509-519), backed by :class:`tensorbnn_tpu.network.Network`."""

from __future__ import annotations

from tensorbnn_tpu.network import Network as _Network
from tensorBNN._compat import to_jnp_dtype


class network(_Network):
    def __init__(self, dtype, inputDims, trainX, trainY, validateX,
                 validateY, seed: int = 0):
        super().__init__(to_jnp_dtype(dtype), inputDims, trainX, trainY,
                         validateX, validateY, seed=seed)

    def add(self, layer, parameters=None):
        """Accepts warm-start parameters attached by the shim layer ctors
        (the reference passes weights/biases to the layer constructor,
        layer.py:110-117)."""
        if parameters is None:
            parameters = getattr(layer, "_ref_warm_start", None)
        return super().add(layer, parameters=parameters)


Network = network
