"""Sequential Bayesian model: a stack of layer specs over dict pytrees.

Replaces the reference's stateful ``network`` object graph — flat
``self.states`` lists indexed by per-layer ``numTensors`` arithmetic
(/root/reference/tensorBNN/network.py:84-171) — with a pure functional model:
params and hypers are tuples of per-layer dicts, and every quantity the
sampler needs (apply, log prior, log hyper prior) is a pure function of those
pytrees, ready for `jax.grad`, `vmap`, and `pjit`.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

from tensorbnn_tpu.models.layers import LayerSpec


class Sequential:
    """An ordered stack of :class:`LayerSpec` objects.

    The model itself is static configuration (hashable, closed over by jitted
    functions); all learnable state lives in the ``(params, hypers)`` pytrees
    returned by :meth:`init`.
    """

    def __init__(self, layers: Sequence[LayerSpec] = ()):
        self.layers: List[LayerSpec] = list(layers)

    def add(self, layer: LayerSpec) -> "Sequential":
        """Appends a layer (mirrors reference ``network.add``,
        network.py:173-191). Returns self for chaining."""
        self.layers.append(layer)
        return self

    # -- state construction --------------------------------------------------

    def init(self, key, dtype=jnp.float32) -> Tuple[tuple, tuple]:
        """Initializes ``(params, hypers)`` as tuples of per-layer dicts."""
        keys = jax.random.split(key, max(len(self.layers), 1))
        params, hypers = [], []
        for layer, k in zip(self.layers, keys):
            p, h = layer.init(k, dtype=dtype)
            params.append(p)
            hypers.append(h)
        return tuple(params), tuple(hypers)

    # -- pure functions of the pytrees ----------------------------------------

    def apply(self, params: tuple, x: jax.Array) -> jax.Array:
        """Forward pass over a ``(batch, features)`` input."""
        for layer, p in zip(self.layers, params):
            x = layer.apply(p, x)
        return x

    def log_prior(self, hypers: tuple, params: tuple) -> jax.Array:
        """Sum of conditional log priors of params given hypers.

        Matches the main-chain prior term of the reference's jitted target
        (network.py:368-392), which sums ``layer.calculateProbs`` over layers
        that own hyperparameters.
        """
        total = jnp.asarray(0.0)
        for layer, h, p in zip(self.layers, hypers, params):
            if layer.has_hypers:
                total = total + layer.log_prior(h, p)
        return total

    def log_hyper_prior(self, hypers: tuple, params: tuple) -> jax.Array:
        """Sum of hyperpriors plus conditional priors at proposed hypers.

        Matches the hyper-chain target's layer term (network.py:414-440,
        summing ``layer.calculateHyperProbs``).
        """
        total = jnp.asarray(0.0)
        for layer, h, p in zip(self.layers, hypers, params):
            if layer.has_hypers:
                total = total + layer.log_hyper_prior(h, p)
        return total

    # -- metadata --------------------------------------------------------------

    @property
    def layer_names(self) -> List[str]:
        """Names for architecture.txt (reference network.py:557-559)."""
        return [layer.name for layer in self.layers]

    def __repr__(self):
        return f"Sequential({self.layer_names})"
