"""MAP pretraining for warm-starting the HMC chain.

Re-implements the capability of the reference's Keras helpers
(/root/reference/tensorBNN/BNN_functions.py:60-298) with optax: a leaky-ReLU
MLP trained by Adam/amsgrad over ``cycles`` rounds with the learning rate
decaying 10x per cycle, minibatch size 32, and early stopping that restores
the best validation weights. Returns dense-layer parameters shaped for
:class:`tensorbnn_tpu.models.layers.GaussianDenseLayer` /
``CauchyDenseLayer`` warm starts (the reference feeds its extracted weights
into layer constructors the same way, Examples/extendedRegression.py:96-145).

Unlike the reference this is a pure-JAX jitted epoch loop — the whole
minibatch sweep is a ``lax.scan`` over pre-shuffled batches, so pretraining
also runs on the TPU.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _mlp_init(key, dims: List[int], dtype=jnp.float32):
    params = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        # glorot-uniform, matching the reference's initializer choice
        limit = float(np.sqrt(6.0 / (dims[i] + dims[i + 1])))
        w = jax.random.uniform(k, (dims[i], dims[i + 1]), dtype,
                               -limit, limit)
        params.append({"w": w, "b": jnp.zeros((dims[i + 1],), dtype)})
    return params


def _mlp_apply(params, x, alpha: float, final_sigmoid: bool,
               hidden_activation: str = "leakyrelu"):
    dense = params["dense"]
    slopes = params.get("slopes")
    for i, p in enumerate(dense):
        x = x @ p["w"] + p["b"]
        if i < len(dense) - 1:
            if hidden_activation == "tanh":
                x = jnp.tanh(x)
            else:
                s = slopes[i] if slopes is not None else alpha
                x = jnp.where(x < 0, s * x, x)
    if final_sigmoid:
        x = jax.nn.sigmoid(x)
    return x


def _train_mlp(hidden: int, input_dims: int, output_dims: int, width: int,
               cycles: int, epochs: int, alpha: float,
               train_in, train_out, val_in, val_out, *,
               classification: bool, base_lr: float,
               patience: int = 10, batch_size: int = 32, seed: int = 1000,
               callbacks: bool = True, verbose: bool = False,
               train_slopes: bool = False,
               hidden_activation: str = "leakyrelu"):
    dtype = jnp.float32
    x = jnp.asarray(train_in, dtype).reshape(len(train_in), input_dims)
    y = jnp.asarray(train_out, dtype).reshape(len(train_out), output_dims)
    xv = jnp.asarray(val_in, dtype).reshape(len(val_in), input_dims)
    yv = jnp.asarray(val_out, dtype).reshape(len(val_out), output_dims)

    dims = [input_dims] + [width] * hidden + [output_dims]
    key = jax.random.key(seed)
    params = {"dense": _mlp_init(key, dims, dtype)}
    if train_slopes:
        # PReLU-style per-feature slopes, trained jointly (the reference's
        # Keras LeakyReLU has no weights, so its returned activation list is
        # always empty despite its own docstring; this option genuinely
        # trains the slope vectors the Prelu/SquarePrelu ctors warm-start
        # from, BNN_functions.py:166-180, ClassificationExample.md:110-126)
        params["slopes"] = [jnp.full((width,), alpha, dtype)
                            for _ in range(hidden)]

    def loss_fn(p, bx, by):
        preds = _mlp_apply(p, bx, alpha, classification, hidden_activation)
        if classification:
            eps = 1e-7
            preds = jnp.clip(preds, eps, 1 - eps)
            return -jnp.mean(by * jnp.log(preds)
                             + (1 - by) * jnp.log1p(-preds))
        return jnp.mean((preds - by) ** 2)

    n = x.shape[0]
    n_batches = max(n // batch_size, 1)

    for cycle in range(cycles):
        lr = base_lr * (10.0 ** (-cycle))
        opt = optax.amsgrad(lr)
        opt_state = opt.init(params)

        @jax.jit
        def run_epoch(p, opt_state, perm):
            bx = x[perm[: n_batches * batch_size]].reshape(
                n_batches, -1, input_dims)
            by = y[perm[: n_batches * batch_size]].reshape(
                n_batches, -1, output_dims)

            def step(carry, batch):
                p, s = carry
                loss, g = jax.value_and_grad(loss_fn)(p, *batch)
                updates, s = opt.update(g, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), loss

            (p, opt_state), losses = jax.lax.scan(step, (p, opt_state),
                                                  (bx, by))
            return p, opt_state, jnp.mean(losses)

        val_loss_fn = jax.jit(lambda p: loss_fn(p, xv, yv))

        best_val = float("inf")
        best_params = params
        strikes = 0
        rng = np.random.default_rng(seed + cycle)
        for epoch in range(epochs):
            perm = jnp.asarray(rng.permutation(n))
            params, opt_state, train_loss = run_epoch(params, opt_state,
                                                      perm)
            val_loss = float(val_loss_fn(params))
            if val_loss < best_val:
                best_val, best_params, strikes = val_loss, params, 0
            else:
                strikes += 1
            if verbose and epoch % 20 == 0:
                print(f"cycle {cycle} epoch {epoch}: "
                      f"train {float(train_loss):.5f} val {val_loss:.5f}")
            if callbacks and strikes >= patience:
                break
        if callbacks:
            params = best_params  # restore_best_weights=True

    weights = [np.asarray(p["w"]).T for p in params["dense"]]  # (out, in)
    biases = [np.asarray(p["b"]).reshape(-1, 1) for p in params["dense"]]
    if train_slopes:
        activations: List = [np.asarray(s) for s in params["slopes"]]
    else:
        # fixed leaky-relu: report the constant per-feature slope vectors
        # (the reference returns [] here because Keras LeakyReLU has no
        # weights — its own docstring promises "all activation vectors")
        activations = [np.full((width,), alpha, np.float32)
                       for _ in range(hidden)]
    return weights, biases, activations


def train_basic_regression(hidden: int, input_dims: int, output_dims: int,
                           width: int, cycles: int, epochs: int, alpha: float,
                           train_in, train_out, val_in, val_out,
                           name: str = None, callbacks: bool = True,
                           patience: int = 10, seed: int = 1000,
                           verbose: bool = False,
                           train_slopes: bool = False,
                           batch_size: int = 32,
                           hidden_activation: str = "leakyrelu"
                           ) -> Tuple[list, list, list]:
    """MAP-pretrains a regression MLP; returns (weights, biases, activations)
    in the reference layout (W: (out, in), b: (out, 1), one slope vector per
    hidden activation) for warm starts.

    Mirrors ``trainBasicRegression`` (reference BNN_functions.py:60-180):
    Adam/amsgrad at lr 0.01 decaying 10x per cycle, early stopping on
    validation loss with best-weight restore. With ``train_slopes=True`` the
    activations are PReLU-style trainable slope vectors (what the reference's
    activation-extraction loop was written for), ready for
    ``prelu_warm_start`` / ``squareprelu_warm_start``.
    """
    del name  # the reference saves a Keras model backup; npz callers can
    # persist the returned arrays directly
    return _train_mlp(hidden, input_dims, output_dims, width, cycles, epochs,
                      alpha, train_in, train_out, val_in, val_out,
                      classification=False, base_lr=0.01,
                      patience=patience, seed=seed, callbacks=callbacks,
                      verbose=verbose, train_slopes=train_slopes,
                      batch_size=batch_size,
                      hidden_activation=hidden_activation)


def train_basic_classification(hidden: int, input_dims: int,
                               output_dims: int, width: int, cycles: int,
                               epochs: int, alpha: float,
                               train_in, train_out, val_in, val_out,
                               name: str = None, callbacks: bool = True,
                               patience: int = 10, seed: int = 1000,
                               verbose: bool = False,
                               train_slopes: bool = False):
    """Binary-classification variant with a sigmoid head and lr 0.001
    (reference BNN_functions.py:183-298)."""
    del name
    return _train_mlp(hidden, input_dims, output_dims, width, cycles, epochs,
                      alpha, train_in, train_out, val_in, val_out,
                      classification=True, base_lr=0.001,
                      patience=patience, seed=seed, callbacks=callbacks,
                      verbose=verbose, train_slopes=train_slopes)


def dense_warm_start(weights: list, biases: list, index: int) -> dict:
    """Converts pretrained (W, b) in reference layout into a params override
    dict for ``Network.add(layer, parameters=...)``."""
    return {"w": np.asarray(weights[index]).T,
            "b": np.asarray(biases[index]).reshape(-1)}


def prelu_warm_start(activations: list, index: int) -> dict:
    """Pretrained slope vector -> Prelu params override (slopes used
    as-is, reference activationFunctions.py:137-151)."""
    return {"slopes": np.asarray(activations[index]).reshape(-1)}


def squareprelu_warm_start(activations: list, index: int,
                           floor: float = 1e-4) -> dict:
    """Pretrained slope vector -> SquarePrelu params override.

    SquarePrelu's sampled parameter is the square root of the effective
    slope (reference activationFunctions.py:412; the tutorial passes
    alpha**0.5, ClassificationExample.md:119); negative learned slopes are
    floored since the squared parameterization cannot represent them.
    """
    s = np.asarray(activations[index], np.float64).reshape(-1)
    return {"slopes": np.sqrt(np.maximum(s, floor))}
