"""User-facing network facade: construct -> add -> setup_mcmc -> train.

Mirrors the reference's three-call public API (/root/reference/tensorBNN/
network.py:19, 173, 193, 509: ``network(...)``, ``.add``, ``.setupMCMC``,
``.train``) over the pure functional core. Unlike the reference object — a
mutable bag of flat tensor lists — this class only assembles configuration
and initial pytrees, then delegates to
:func:`tensorbnn_tpu.sampler.driver.sample_posterior`.

CamelCase aliases (``setupMCMC``, keyword names like ``stepSizeStart``) are
accepted so reference scripts port with minimal edits.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from tensorbnn_tpu.likelihoods import Likelihood
from tensorbnn_tpu.models.layers import LayerSpec
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.sampler.driver import MCMCConfig, RunResult, \
    sample_posterior

#: reference setupMCMC kwarg -> MCMCConfig field (network.py:193-198)
_REF_KWARGS = {
    "stepSizeStart": "step_size_start",
    "stepSizeMin": "step_size_min",
    "stepSizeMax": "step_size_max",
    "stepSizeOptions": "step_size_options",
    "leapfrogStart": "leapfrog_start",
    "leapfogMin": "leapfrog_min",        # [sic] reference typo kept as alias
    "leapfrogMin": "leapfrog_min",
    "leapFrogMax": "leapfrog_max",
    "leapfrogMax": "leapfrog_max",
    "leapfrogIncrement": "leapfrog_increment",
    "hyperStepSize": "hyper_step_size",
    "hyperLeapfrog": "hyper_leapfrog",
    "burnin": "burnin",
    "averagingSteps": "averaging_steps",
    "a": "a",
    "delta": "delta",
    "strikes": "max_strikes",
    "randomSteps": "random_steps",
}


class Network:
    """Holds data, model layers and sampler config; runs the sampler."""

    def __init__(self, dtype, input_dims: int, train_x, train_y,
                 validate_x, validate_y, seed: int = 0):
        self.dtype = jnp.dtype(dtype) if dtype is not None else jnp.float32
        self.input_dims = input_dims
        import jax as _jax
        import numpy as _np
        for name, arr in (("train_x", train_x), ("train_y", train_y),
                          ("validate_x", validate_x),
                          ("validate_y", validate_y)):
            # a NaN/inf row would make every HMC proposal reject (NaN
            # log-likelihood) with no error — fail loudly instead. The
            # check stays in the array's own dtype and place: device
            # arrays are validated device-side (one scalar fetch, no
            # tunnel transfer of the data), host arrays with np.isfinite
            # on the original dtype (no float64 copy — the 1M-point
            # surrogate would pay ~100MB of transient host allocation)
            if isinstance(arr, _jax.Array):
                bad = int(jnp.sum(~jnp.isfinite(arr)))
                size = arr.size
            else:
                a = _np.asarray(arr)
                if a.dtype.kind not in "fc":
                    continue  # integer/bool data is always finite
                bad = int((~_np.isfinite(a)).sum())
                size = a.size
            if bad:
                raise ValueError(
                    f"{name} contains non-finite values "
                    f"({bad} of {size})")
        for name, arr in (("train_x", train_x), ("validate_x", validate_x)):
            # shape-only check: np.asarray on a device array would pull
            # the whole dataset through the host tunnel
            size = (int(_np.prod(arr.shape)) if hasattr(arr, "shape")
                    else _np.asarray(arr).size)
            if size != len(arr) * input_dims:
                raise ValueError(
                    f"{name} width does not match input_dims="
                    f"{input_dims}: {size} values for {len(arr)} rows "
                    f"(expected {len(arr) * input_dims})")
        self.train_x = jnp.asarray(train_x, self.dtype).reshape(
            len(train_x), input_dims)
        self.train_y = jnp.asarray(train_y, self.dtype)
        self.validate_x = jnp.asarray(validate_x, self.dtype).reshape(
            len(validate_x), input_dims)
        self.validate_y = jnp.asarray(validate_y, self.dtype)

        self.model = Sequential()
        self._param_overrides = []
        self.config: Optional[MCMCConfig] = None
        self.key = jax.random.key(seed)
        self.results: Optional[RunResult] = None

    def add(self, layer: LayerSpec, parameters: Optional[dict] = None):
        """Adds a layer, optionally with explicit starting parameters (used
        for MAP warm starts, reference network.py:173-191)."""
        self.model.add(layer)
        self._param_overrides.append(parameters)
        return self

    def setup_mcmc(self, **kwargs) -> MCMCConfig:
        """Configures the sampler. Accepts MCMCConfig field names and the
        reference's camelCase kwargs."""
        mapped = {}
        for k, v in kwargs.items():
            if k in _REF_KWARGS:
                mapped[_REF_KWARGS[k]] = v
            else:
                mapped[k] = v
        mapped.pop("cores", None)         # vestigial in the reference too
        mapped.pop("dualAveraging", None)  # stored-but-unused there
        self.config = MCMCConfig(**mapped)
        return self.config

    # reference-name alias
    setupMCMC = setup_mcmc

    def init_state(self):
        """Initializes (params, hypers) pytrees, applying warm-start
        overrides."""
        self.key, init_key = jax.random.split(self.key)
        params, hypers = self.model.init(init_key, dtype=self.dtype)
        params = list(params)
        for i, override in enumerate(self._param_overrides):
            if override:
                params[i] = {**params[i],
                             **{k: jnp.asarray(v, self.dtype)
                                for k, v in override.items()}}
        return tuple(params), hypers

    def train(self, epochs: int, sampling_step: int, likelihood: Likelihood,
              metric_list: Sequence = (), adjust_hypers: bool = True,
              folder_name: Optional[str] = None,
              networks_per_file: int = 1000,
              display_skip: int = 0, verbose: bool = True,
              n_chains: int = 1, n_adapters: int = 1,
              chain_jitter: float = 0.0, mesh=None,
              use_fused: str = "auto", state_layout: str = "auto",
              data_chunk: Optional[int] = None,
              precondition=False,
              precondition_clip=(1e-2, 1e2),
              precondition_windows: int = 1,
              compensated: bool = False,
              numerics: str = "default",
              trajectory: str = "adapter",
              uturn_probe: str = "alternate",
              tempering: int = 1,
              tempering_beta_min: float = 0.1,
              checkpoint_dir=None,
              checkpoint_every: int = 0, tracer=None,
              keep_samples="auto",
              max_dispatch_seconds: Optional[float] = None,
              **kwargs) -> RunResult:
        """Runs the sampler (reference ``network.train``, network.py:509).

        Returns a :class:`RunResult` with stacked posterior samples and
        per-epoch diagnostics; also writes the reference text format when
        ``folder_name`` is given.
        """
        # accept reference camelCase forwarding
        metric_list = kwargs.pop("metricList", metric_list)
        adjust_hypers = kwargs.pop("adjustHypers", adjust_hypers)
        folder_name = kwargs.pop("folderName", folder_name)
        networks_per_file = kwargs.pop("networksPerFile", networks_per_file)
        display_skip = kwargs.pop("displaySkip", display_skip)
        kwargs.pop("scaleExp", None)
        if kwargs:
            raise TypeError(f"unknown train() kwargs: {sorted(kwargs)}")
        if self.config is None:
            raise RuntimeError("call setup_mcmc() before train()")

        params, hypers = self.init_state()
        self.key, run_key = jax.random.split(self.key)

        self.results = sample_posterior(
            self.model, likelihood, self.train_x, self.train_y,
            config=self.config, params=params, hypers=hypers,
            key=run_key, epochs=epochs, sampling_step=sampling_step,
            adjust_hypers=adjust_hypers, metric_list=metric_list,
            x_validate=self.validate_x, y_validate=self.validate_y,
            display_skip=display_skip, folder_name=folder_name,
            networks_per_file=networks_per_file, dtype=self.dtype,
            n_chains=n_chains, n_adapters=n_adapters,
            chain_jitter=chain_jitter, mesh=mesh,
            use_fused=use_fused, state_layout=state_layout,
            data_chunk=data_chunk, precondition=precondition,
            precondition_clip=precondition_clip,
            precondition_windows=precondition_windows,
            compensated=compensated,
            numerics=numerics,
            trajectory=trajectory,
            uturn_probe=uturn_probe,
            tempering=tempering,
            tempering_beta_min=tempering_beta_min,
            checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, tracer=tracer,
            keep_samples=keep_samples,
            max_dispatch_seconds=max_dispatch_seconds, verbose=verbose)
        return self.results

    def predict(self, train: bool = True, params: Optional[tuple] = None):
        """Forward pass on the train or validation split."""
        if params is None:
            params, _ = self.init_state()
        x = self.train_x if train else self.validate_x
        return self.model.apply(params, x)


# lowercase alias matching the reference class name (network.py:13)
network = Network
