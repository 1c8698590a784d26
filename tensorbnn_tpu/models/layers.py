"""Bayesian layer specifications as pure functional pytree components.

This is the L1 model layer (SURVEY.md #1). The reference implements layers as
stateful objects with flat-list tensor bookkeeping (``numTensors`` index
arithmetic, /root/reference/tensorBNN/layer.py:10-98); here each layer is an
immutable *spec* whose parameters and hyperparameters live in dict pytrees,
so the whole model is a pytree that `jax.grad` / `vmap` / `pjit` traverse
natively. Data is batch-major ``(batch, features)`` — the TPU-natural layout —
rather than the reference's transposed ``(features, batch)`` column-major
convention (layer.py:266-279; SURVEY.md #2.3.6).

Every spec provides:

* ``init(key, dtype)``       -> ``(params, hypers)`` dict pytrees
* ``apply(params, x)``       -> layer output, x is ``(batch, features)``
* ``log_prior(hypers, params)``      -> conditional log prior of params given
  hypers (reference ``calculateProbs``, layer.py:166-197, 346-377)
* ``log_hyper_prior(hypers, params)`` -> hyperprior plus the conditional prior
  of the current params under proposed hypers (reference
  ``calculateHyperProbs``, layer.py:199-242, 379-422)

Scale hyperparameters follow the reference's squared parameterization:
prior sd (or Cauchy gamma) = hyper**2 (SURVEY.md #2.3.2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.distributions import (
    cauchy_logprob,
    cauchy_logprob_compat,
    exponential_logprob,
    gaussian_logprob,
    normal_logprob,
)

Params = Dict[str, jax.Array]
Hypers = Dict[str, jax.Array]


class LayerSpec:
    """Base layer spec. Stateless layers inherit the no-op defaults."""

    #: registry name, written to architecture.txt (reference network.py:557-559)
    name: str = "layer"
    #: number of state tensors the *reference* format stores for this layer
    n_ref_param_tensors: int = 0
    #: number of scalar hyper entries the reference format stores
    n_ref_hyper_scalars: int = 0

    def init(self, key, dtype=jnp.float32) -> Tuple[Params, Hypers]:
        del key, dtype
        return {}, {}

    def apply(self, params: Params, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def log_prior(self, hypers: Hypers, params: Params) -> jax.Array:
        del hypers, params
        return jnp.asarray(0.0)

    def log_hyper_prior(self, hypers: Hypers, params: Params) -> jax.Array:
        del hypers, params
        return jnp.asarray(0.0)

    @property
    def has_params(self) -> bool:
        return self.n_ref_param_tensors > 0

    @property
    def has_hypers(self) -> bool:
        return self.n_ref_hyper_scalars > 0

    # -- reference text-format conversion (SURVEY.md #5 checkpoint) -----------
    # The reference stores per-layer state tensors in column-major layout
    # (W: (out, in), b: (out, 1); network.py:647-651) and hypers as flat
    # scalars in declaration order. These hooks let the IO layer round-trip
    # that format against the TPU-natural pytrees.

    def ref_param_tensors(self, params: Params) -> list:
        del params
        return []

    def params_from_ref(self, tensors: list) -> Params:
        del tensors
        return {}

    def ref_hyper_values(self, hypers: Hypers) -> list:
        del hypers
        return []

    def hypers_from_ref(self, values: list) -> Hypers:
        del values
        return {}


def _he_like_init(key, in_dim, out_dim, dtype):
    """Weight/bias init matching the reference's sampling scheme.

    The reference draws both weights and biases from N(0, sqrt(2/outputDims))
    (layer.py:244-264, 424-444). Weights are stored TPU-natural as
    ``(in, out)`` kernels; biases as ``(out,)``.
    """
    kw, kb = jax.random.split(key)
    std = math.sqrt(2.0 / out_dim)
    w = std * jax.random.normal(kw, (in_dim, out_dim), dtype=dtype)
    b = std * jax.random.normal(kb, (out_dim,), dtype=dtype)
    return w, b


class _DenseCompute:
    """Shared dense forward pass with an optional reduced-precision matmul.

    With ``compute_dtype="bfloat16"`` the matmul runs on bf16 inputs with
    f32 accumulation (``preferred_element_type``) — the MXU's native mode
    on TPU — and the layer *output* is cast back to bf16, so in a stack of
    bf16 layers the whole activation stream (forward activations, their
    cached copies for the backward pass, and the activation gradients)
    stays bf16 end-to-end and each layer's input cast is a no-op. Keeping
    the output f32 instead (the round-2 behavior) put a full-width
    cast/read of every activation plane back on the HBM path each leapfrog
    step, which is why bf16 measured ~1.03x then (benchmarks/PERF_NOTES.md
    round 3). The log posterior then *is* the bf16-forward density: MH
    acceptance stays exact for that (slightly perturbed) target, so chains
    remain valid draws; default is full f32 for bitwise-stable parity runs.

    ``matmul_precision`` raises the precision instead: on TPU the
    *default* f32 matmul also rounds its operands to bf16 on the MXU
    (one pass), which makes the evaluated log posterior a **staircase**
    in theta — weights move continuously but the density only changes
    when a weight crosses a bf16 rounding boundary, and on a big-data
    posterior each such crossing jumps the log likelihood by O(nats)
    (gradient-sized jump x bf16 ulp, summed over N rows). The MH test
    then sees O(nats) of pseudo-noise per trajectory that shrinks only
    ~linearly in eps, capping acceptance far below the integrator's
    eps^2 curve (measured on the 1M-point surrogate,
    benchmarks/PERF_NOTES.md round 4). ``"highest"`` evaluates the f32
    matmul exactly (multi-pass on the MXU); ``"high"`` is the cheaper
    3-pass bf16 variant. The precision threads through to the VJP's
    transposed matmuls too, so gradients sharpen with the values.
    Mutually exclusive with ``compute_dtype`` (which *asks* for bf16
    operands).
    """

    def __post_init__(self):
        if (getattr(self, "compute_dtype", None)
                and getattr(self, "matmul_precision", None)):
            raise ValueError(
                "compute_dtype and matmul_precision are mutually "
                "exclusive: one asks for bf16 operands, the other for "
                "exact-f32 matmuls")

    def _dense_apply(self, params, x):
        cd = getattr(self, "compute_dtype", None)
        if cd is not None:
            dt = jnp.dtype(cd)
            y = jnp.dot(x.astype(dt), params["w"].astype(dt),
                        preferred_element_type=jnp.float32)
            return (y + params["b"]).astype(dt)
        prec = getattr(self, "matmul_precision", None)
        if prec is not None:
            return jnp.dot(x, params["w"], precision=prec) + params["b"]
        return x @ params["w"] + params["b"]


class _DenseRefIO:
    """Reference-format conversions shared by both dense layers.

    Conversions accept an optional leading stacked-sample axis: the reference
    matrix layout is ``(..., out, in)`` for weights and ``(..., out, 1)`` for
    biases (layer.py:253-262), versus the TPU-natural ``(..., in, out)``
    kernel and ``(..., out)`` bias used here.
    """

    _HYPER_KEYS = ("w_loc", "w_scale", "b_loc", "b_scale")

    # numpy on purpose: these run on host per network per chain in the
    # streaming writer — jnp here routes every tiny transpose through the
    # JAX dispatcher (measured 10x the whole append cost at 512 chains)

    def ref_param_tensors(self, params):
        w = np.swapaxes(np.asarray(params["w"]), -1, -2)
        b = np.asarray(params["b"])[..., None]
        return [w, b]

    def params_from_ref(self, tensors):
        w, b = tensors
        return {
            "w": np.swapaxes(np.asarray(w), -1, -2),
            "b": np.asarray(b)[..., 0],
        }

    def ref_hyper_values(self, hypers):
        return [np.asarray(hypers[k]) for k in self._HYPER_KEYS]

    def hypers_from_ref(self, values):
        return {k: np.asarray(v) for k, v in zip(self._HYPER_KEYS, values)}


@dataclasses.dataclass(frozen=True)
class GaussianDenseLayer(_DenseCompute, _DenseRefIO, LayerSpec):
    """Dense layer with Gaussian priors on weights and biases.

    Re-implements the behavior of the reference ``GaussianDenseLayer``
    (layer.py:282-459): four scalar hypers (weight mean, weight sd-root, bias
    mean, bias sd-root); the conditional prior uses the reference-exact
    ``gaussian_logprob`` normalization with sd = hyper**2; hyperpriors are
    N(0, 0.1) on the means and N(1, 0.1) evaluated at the *squared* scale
    hyper (layer.py:379-409).
    """

    in_dim: int
    out_dim: int
    name: str = "denseGaussian"
    n_ref_param_tensors: int = 2
    n_ref_hyper_scalars: int = 4
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" (MXU-native)
    matmul_precision: Optional[str] = None  # "high"/"highest" (see above)

    def init(self, key, dtype=jnp.float32):
        w, b = _he_like_init(key, self.in_dim, self.out_dim, dtype)
        params = {"w": w, "b": b}
        hypers = {
            "w_loc": jnp.asarray(0.0, dtype),
            "w_scale": jnp.asarray(1.0, dtype),
            "b_loc": jnp.asarray(0.0, dtype),
            "b_scale": jnp.asarray(1.0, dtype),
        }
        return params, hypers

    def apply(self, params, x):
        return self._dense_apply(params, x)

    def log_prior(self, hypers, params):
        w_sd = hypers["w_scale"] ** 2
        b_sd = hypers["b_scale"] ** 2
        return gaussian_logprob(w_sd, hypers["w_loc"], params["w"]) + \
            gaussian_logprob(b_sd, hypers["b_loc"], params["b"])

    def log_hyper_prior(self, hypers, params):
        w_sd = hypers["w_scale"] ** 2
        b_sd = hypers["b_scale"] ** 2
        prob = jnp.sum(normal_logprob(hypers["w_loc"], 0.0, 0.1))
        prob += jnp.sum(normal_logprob(w_sd, 1.0, 0.1))
        prob += jnp.sum(normal_logprob(hypers["b_loc"], 0.0, 0.1))
        prob += jnp.sum(normal_logprob(b_sd, 1.0, 0.1))
        return prob + self.log_prior(hypers, params)


@dataclasses.dataclass(frozen=True)
class CauchyDenseLayer(_DenseCompute, _DenseRefIO, LayerSpec):
    """Dense layer with Cauchy priors (the reference's default ``DenseLayer``).

    Re-implements reference ``CauchyDenseLayer`` (layer.py:101-279): gamma =
    hyper**2; hyperpriors N(0, 0.2) on locations and N(sqrt(0.5), 0.5)
    evaluated at the squared gamma hyper. By default this uses the
    reference's sign-flipped Cauchy "log prob" (SURVEY.md #2.3.1) for
    statistical parity; set ``proper=True`` for the true Cauchy density.
    """

    in_dim: int
    out_dim: int
    proper: bool = False
    name: str = "dense"
    n_ref_param_tensors: int = 2
    n_ref_hyper_scalars: int = 4
    compute_dtype: Optional[str] = None  # e.g. "bfloat16" (MXU-native)
    matmul_precision: Optional[str] = None  # "high"/"highest" (see above)

    def _cauchy(self, gamma, x0, x):
        fn = cauchy_logprob if self.proper else cauchy_logprob_compat
        return jnp.sum(fn(gamma, x0, x))

    def init(self, key, dtype=jnp.float32):
        w, b = _he_like_init(key, self.in_dim, self.out_dim, dtype)
        params = {"w": w, "b": b}
        g0 = math.sqrt(0.5)
        hypers = {
            "w_loc": jnp.asarray(0.0, dtype),
            "w_scale": jnp.asarray(g0, dtype),
            "b_loc": jnp.asarray(0.0, dtype),
            "b_scale": jnp.asarray(g0, dtype),
        }
        return params, hypers

    def apply(self, params, x):
        return self._dense_apply(params, x)

    def log_prior(self, hypers, params):
        w_gamma = hypers["w_scale"] ** 2
        b_gamma = hypers["b_scale"] ** 2
        return self._cauchy(w_gamma, hypers["w_loc"], params["w"]) + \
            self._cauchy(b_gamma, hypers["b_loc"], params["b"])

    def log_hyper_prior(self, hypers, params):
        w_gamma = hypers["w_scale"] ** 2
        b_gamma = hypers["b_scale"] ** 2
        g0 = math.sqrt(0.5)
        prob = jnp.sum(normal_logprob(hypers["w_loc"], 0.0, 0.2))
        prob += jnp.sum(normal_logprob(w_gamma, g0, 0.5))
        prob += jnp.sum(normal_logprob(hypers["b_loc"], 0.0, 0.2))
        prob += jnp.sum(normal_logprob(b_gamma, g0, 0.5))
        return prob + self.log_prior(hypers, params)


# alias matching the reference's ``DenseLayer = CauchyDenseLayer`` (layer.py:461)
DenseLayer = CauchyDenseLayer


@dataclasses.dataclass(frozen=True)
class Activation(LayerSpec):
    """Stateless elementwise activation."""

    name: str = "activation"
    _fn: Callable = None  # type: ignore[assignment]

    def apply(self, params, x):
        del params
        return self._fn(x)


def Exp():
    return Activation(name="Exp", _fn=jnp.exp)


def Relu():
    return Activation(name="relu", _fn=jax.nn.relu)


def Sigmoid():
    return Activation(name="sigmoid", _fn=jax.nn.sigmoid)


def Tanh():
    return Activation(name="tanh", _fn=jnp.tanh)


def Elu():
    return Activation(name="elu", _fn=jax.nn.elu)


def Softmax():
    """Softmax over the feature axis.

    Note: the reference applies ``gen_nn_ops.softmax`` to its column-major
    ``(features, batch)`` matrix (activationFunctions.py:88), normalizing over
    the *batch* — almost certainly unintended. In batch-major layout the
    feature axis is the meaningful one; this is a recorded divergence.
    """
    return Activation(name="softmax", _fn=lambda x: jax.nn.softmax(x, axis=-1))


@dataclasses.dataclass(frozen=True)
class LeakyRelu(LayerSpec):
    """Leaky ReLU with a fixed slope.

    The reference stores alpha as a chain state tensor with a flat prior but
    its forward pass ignores the chain value and always uses the constructor
    constant (activationFunctions.py:92-114), so the sampled copy is dead
    weight. Here alpha is simply a fixed constant — identical predictions,
    one junk chain dimension removed. ``n_ref_param_tensors=1`` is kept so
    reference-format checkpoints round-trip.
    """

    alpha: float = 0.3
    name: str = "leakyrelu"
    n_ref_param_tensors: int = 1
    n_ref_hyper_scalars: int = 0

    def init(self, key, dtype=jnp.float32):
        del key
        return {}, {}

    @property
    def has_params(self) -> bool:
        return False

    def apply(self, params, x):
        del params
        return jnp.where(x < 0, self.alpha * x, x)

    def ref_param_tensors(self, params):
        del params
        return [np.asarray([self.alpha])]

    def params_from_ref(self, tensors):
        del tensors  # the saved alpha copy is dead weight (see class doc)
        return {}


@dataclasses.dataclass(frozen=True)
class Prelu(LayerSpec):
    """PReLU with HMC-sampled slopes under an exponential prior.

    Re-implements reference ``Prelu`` (activationFunctions.py:117-271): one
    slope per feature, exponential(rate) prior with the rate itself under an
    exponential(0.3) hyperprior. The reference's main-chain prior call is
    broken for this layer (wrong arity, SURVEY.md #2.3.7); here the intended
    semantics — conditional prior under the *current chain* rate — is used.
    The hyper-chain conditional uses abs(slopes) exactly as the reference
    does (activationFunctions.py:209).
    """

    in_dim: int
    alpha: float = 0.2
    name: str = "prelu"
    n_ref_param_tensors: int = 1
    n_ref_hyper_scalars: int = 1

    def init(self, key, dtype=jnp.float32):
        del key
        params = {"slopes": jnp.full((self.in_dim,), self.alpha, dtype)}
        hypers = {"rate": jnp.asarray(0.3, dtype)}
        return params, hypers

    def apply(self, params, x):
        s = params["slopes"]
        return jnp.where(x < 0, s * x, x)

    def log_prior(self, hypers, params):
        return jnp.sum(exponential_logprob(hypers["rate"], params["slopes"]))

    def log_hyper_prior(self, hypers, params):
        prob = jnp.sum(exponential_logprob(0.3, hypers["rate"]))
        prob += jnp.sum(
            exponential_logprob(hypers["rate"], jnp.abs(params["slopes"])))
        return prob

    def ref_param_tensors(self, params):
        return [np.asarray(params["slopes"])[..., None]]

    def params_from_ref(self, tensors):
        return {"slopes": np.asarray(tensors[0])[..., 0]}

    def ref_hyper_values(self, hypers):
        return [np.asarray(hypers["rate"])]

    def hypers_from_ref(self, values):
        return {"rate": np.asarray(values[0])}


@dataclasses.dataclass(frozen=True)
class SquarePrelu(LayerSpec):
    """PReLU whose effective slope is the square of the sampled parameter.

    Re-implements reference ``SquarePrelu`` (activationFunctions.py:274-433):
    slope = param**2 in the forward pass; Gaussian prior on the raw slopes in
    the main chain and on the *squared* slopes in the hyper chain (matching
    the reference's asymmetry); hyperpriors N(0, 0.3) on the prior mean and
    N(0.3, 0.1) on the prior sd.
    """

    in_dim: int
    alpha: float = 0.2
    name: str = "squareprelu"
    n_ref_param_tensors: int = 1
    n_ref_hyper_scalars: int = 2

    def init(self, key, dtype=jnp.float32):
        del key
        params = {"slopes": jnp.full((self.in_dim,), self.alpha, dtype)}
        hypers = {
            "loc": jnp.asarray(0.0, dtype),
            "scale": jnp.asarray(0.3, dtype),
        }
        return params, hypers

    def apply(self, params, x):
        s = params["slopes"] ** 2
        return jnp.where(x < 0, s * x, x)

    def log_prior(self, hypers, params):
        return gaussian_logprob(hypers["scale"], hypers["loc"],
                                params["slopes"])

    def log_hyper_prior(self, hypers, params):
        prob = gaussian_logprob(hypers["scale"], hypers["loc"],
                                params["slopes"] ** 2)
        prob += jnp.sum(normal_logprob(hypers["loc"], 0.0, 0.3))
        prob += jnp.sum(normal_logprob(hypers["scale"], 0.3, 0.1))
        return prob

    def ref_param_tensors(self, params):
        return [np.asarray(params["slopes"])[..., None]]

    def params_from_ref(self, tensors):
        return {"slopes": np.asarray(tensors[0])[..., 0]}

    def ref_hyper_values(self, hypers):
        return [np.asarray(hypers["loc"]), np.asarray(hypers["scale"])]

    def hypers_from_ref(self, values):
        return {"loc": np.asarray(values[0]),
                "scale": np.asarray(values[1])}


#: registry mapping reference architecture.txt names to spec constructors,
#: mirroring the predictor's layerDict (reference predictor.py:30-34).
LAYER_REGISTRY = {
    "Exp": lambda **kw: Exp(),
    "relu": lambda **kw: Relu(),
    "sigmoid": lambda **kw: Sigmoid(),
    "tanh": lambda **kw: Tanh(),
    "elu": lambda **kw: Elu(),
    "softmax": lambda **kw: Softmax(),
    "leakyrelu": lambda **kw: LeakyRelu(**kw),
    "prelu": lambda in_dim=1, **kw: Prelu(in_dim=in_dim, **kw),
    "squareprelu": lambda in_dim=1, **kw: SquarePrelu(in_dim=in_dim, **kw),
    "dense": lambda in_dim=1, out_dim=1, **kw: CauchyDenseLayer(
        in_dim=in_dim, out_dim=out_dim, **kw),
    "denseGaussian": lambda in_dim=1, out_dim=1, **kw: GaussianDenseLayer(
        in_dim=in_dim, out_dim=out_dim, **kw),
}
