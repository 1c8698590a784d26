"""Posterior-ensemble predictor: vmapped inference over saved sample stacks.

Re-designs the reference ``predictor`` (/root/reference/tensorBNN/
predictor.py): where the reference loops over saved networks one forward
pass at a time (predictor.py:142-154, O(networks) kernel launches), here the
whole ensemble is one ``vmap`` of the pure apply over the stacked sample
axis — a single batched dispatch that tiles onto the MXU.

Capabilities at parity with the reference:

* ``predict``                 — ensemble predictions (every n-th network);
  with ``mesh=`` the ensemble shards over the mesh's ``chains`` axis and
  the input batch over ``data`` (embarrassingly parallel — XLA partitions
  the vmapped apply with no collectives), the serving-scale path
* ``reweight``                — importance weights under swapped priors
  (exp(logp_new - logp_old), normalized; predictor.py:248-273)
* ``autocorrelation`` / ``autocorrelation_length`` — FFT-based, averaged
  over test points (predictor.py:275-312)
* ``extract_parameters`` / ``extract_hyper_parameters`` /
  ``parameter_statistics`` / ``hyper_statistics``

Reads both the reference text format and the native npz store. Known
reference quirk kept: Bernoulli reweighting is prior-only (its likelihood
term returns zeros, reference likelihood.py:239-243).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tensorbnn_tpu.io import checkpoint, reference_format
from tensorbnn_tpu.likelihoods import (
    BernoulliLikelihood,
    GaussianLikelihood,
    Likelihood,
)
from tensorbnn_tpu.models.layers import LAYER_REGISTRY, LayerSpec
from tensorbnn_tpu.models.sequential import Sequential
from tensorbnn_tpu.utils import autocorr


class Predictor:
    def __init__(self, directory_path: str, dtype=jnp.float32,
                 custom_layer_dict: Optional[Dict] = None,
                 likelihood: Likelihood = GaussianLikelihood(sd=0.1),
                 layers: Optional[Sequence[LayerSpec]] = None,
                 mesh=None):
        """Loads a saved posterior-sample directory.

        Arguments:
            * directory_path: run directory (reference text format, or a
              native store containing ``samples.npz``)
            * custom_layer_dict: extra name -> spec-constructor entries
            * likelihood: the training likelihood (used for reweighting)
            * layers: explicit layer specs; if omitted they are rebuilt from
              ``architecture.txt`` via the registry (reference
              predictor.py:115-130)
            * mesh: optional ``(chains, data)`` ``jax.sharding.Mesh`` —
              ``predict`` shards the ensemble over ``chains`` and the input
              batch over ``data`` (multi-chip serving; single-chip calls
              are unchanged)
        """
        self.dtype = dtype
        self.registry = dict(LAYER_REGISTRY)
        if custom_layer_dict:
            self.registry.update(custom_layer_dict)
        self.likelihood = likelihood
        self.directory_path = directory_path
        self.mesh = mesh
        self._train_log_weights = None

        if os.path.exists(os.path.join(directory_path, "samples.npz")):
            self._load_native(directory_path, layers)
        else:
            self._load_reference(directory_path, layers)

        self.n_networks = self._count_networks()
        self._param_device_cache = {}
        self._apply_ens = jax.jit(jax.vmap(self._apply_one, in_axes=(0, None)))
        self._apply_ens_sharded = None   # built lazily per mesh
        self._mesh_cache = None          # (mesh, {thin_n: ensemble})

    # -- loading ---------------------------------------------------------------

    def _make_layers(self, names: List[str],
                     layers: Optional[Sequence[LayerSpec]]):
        if layers is not None:
            self.layers = list(layers)
        else:
            self.layers = [self.registry[name]() for name in names]
        self.model = Sequential(self.layers)

    def _load_reference(self, path, layers):
        names, matrices, hyper_mat, chain_ids = \
            reference_format.load_run(path)
        if chain_ids is not None:
            # streamed multichain runs are time-major on disk; reorder to
            # chain-major (stable, so time order is preserved within each
            # chain) — the same pooling order as RunResult.theta_pooled
            order = np.argsort(chain_ids, kind="stable")
            matrices = [m[order] for m in matrices]
            if hyper_mat.size:
                hyper_mat = hyper_mat[order]
            chain_ids = chain_ids[order]
        self.chain_index = chain_ids
        self._make_layers(names, layers)
        self.param_samples = reference_format.assign_ref_tensors(
            self.layers, matrices)
        self.hyper_samples, lik_cols = reference_format.assign_ref_hypers(
            self.layers, hyper_mat)
        self.lik_hyper_samples = self._lik_hypers_from_cols(lik_cols)
        self._matrices = matrices

    def _load_native(self, path, layers):
        params, hypers, lik = checkpoint.load_samples(path)
        arch = os.path.join(path, "architecture.txt")
        names = []
        if os.path.exists(arch):
            with open(arch) as f:
                names = [line.strip() for line in f if line.strip()]
        self._make_layers(names, layers)
        self.param_samples = params
        self.hyper_samples = hypers
        self.lik_hyper_samples = lik
        self._matrices = None
        self.chain_index = None  # npz stores are already chain-major

    def _lik_hypers_from_cols(self, cols: np.ndarray) -> dict:
        keys = sorted(self.likelihood.init_hypers())
        return {k: cols[..., i] for i, k in enumerate(keys)}

    def _count_networks(self) -> int:
        for layer_params in self.param_samples:
            for v in layer_params.values():
                return int(np.asarray(v).shape[0])
        return 0

    # -- inference ---------------------------------------------------------------

    def _apply_one(self, params, x):
        return self.model.apply(params, x)

    def _thin(self, tree, n: int):
        return jax.tree.map(lambda v: jnp.asarray(v)[::n], tree)

    def _thin_params_cached(self, n: int):
        """Device-resident thinned ensemble, cached per thinning factor —
        repeated predict calls skip the host->device ensemble transfer."""
        cached = self._param_device_cache.get(n)
        if cached is None:
            cached = self._thin(self.param_samples, n)
            self._param_device_cache[n] = cached
        return cached

    def predict(self, input_matrix, n: int = 1, mesh=None) -> np.ndarray:
        """Ensemble predictions using every n-th network.

        Returns an array of shape (ceil(S/n), batch, out_dims) — one vmapped
        dispatch instead of the reference's per-network python loop
        (predictor.py:142-154). With a mesh (argument, or the constructor's)
        the networks axis shards over ``chains`` and the batch over ``data``
        — both axes are embarrassingly parallel, so XLA partitions the
        dispatch with zero collectives; non-divisible sizes are padded and
        sliced off the result.
        """
        x = jnp.asarray(input_matrix, self.dtype)
        if x.ndim == 1:
            x = x[:, None]
        mesh = mesh if mesh is not None else self.mesh
        if mesh is not None:
            return self._predict_sharded(x, n, mesh)
        params = self._thin_params_cached(n)
        return np.asarray(self._apply_ens(params, x))

    def _predict_sharded(self, x, n: int, mesh) -> np.ndarray:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from tensorbnn_tpu.parallel.mesh import CHAIN_AXIS, DATA_AXIS

        n_ens = mesh.shape[CHAIN_AXIS]
        n_dat = mesh.shape[DATA_AXIS]

        # one mesh at a time: the cache holds a strong mesh reference
        # (identity-compared, so a GC'd mesh can never alias a new one)
        # and resets when the mesh changes — no unbounded growth across
        # meshes, and repeated calls on one mesh skip the transfer
        if getattr(self, "_mesh_cache", None) is None or \
                self._mesh_cache[0] is not mesh:
            self._mesh_cache = (mesh, {})
        cached = self._mesh_cache[1].get(n)
        if cached is None:
            params = jax.tree.map(np.asarray, self._thin(
                self.param_samples, n))
            s = next(np.asarray(v).shape[0]
                     for lp in params for v in lp.values())
            pad_s = (-s) % n_ens
            if pad_s:
                # pad with copies of the first network; sliced off below
                params = jax.tree.map(
                    lambda v: np.concatenate(
                        [v, np.repeat(v[:1], pad_s, axis=0)]), params)
            params = jax.device_put(
                jax.tree.map(lambda v: jnp.asarray(v, self.dtype), params),
                NamedSharding(mesh, P(CHAIN_AXIS)))
            cached = (params, s)
            self._mesh_cache[1][n] = cached
        params, s = cached

        b = x.shape[0]
        pad_b = (-b) % n_dat
        if pad_b:
            x = jnp.concatenate([x, jnp.zeros((pad_b,) + x.shape[1:],
                                              x.dtype)])
        x = jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))

        if self._apply_ens_sharded is None or \
                self._apply_ens_sharded[0] is not mesh:
            fn = jax.jit(
                jax.vmap(self._apply_one, in_axes=(0, None)),
                out_shardings=NamedSharding(mesh, P(CHAIN_AXIS, DATA_AXIS)))
            self._apply_ens_sharded = (mesh, fn)
        out = self._apply_ens_sharded[1](params, x)
        return np.asarray(out)[:s, :b]

    def predict_mean_sd(self, input_matrix, n: int = 1, mesh=None):
        """Posterior predictive mean and sd over the ensemble."""
        preds = self.predict(input_matrix, n, mesh=mesh)
        return preds.mean(axis=0), preds.std(axis=0)

    def predict_quantiles(self, input_matrix, n: int = 1, mesh=None, *,
                          qs=(0.025, 0.5, 0.975)) -> np.ndarray:
        """Posterior predictive quantiles over the ensemble.

        Positional arguments mirror ``predict``/``predict_mean_sd``
        (``input_matrix, n, mesh``); ``qs`` is keyword-only. Returns
        shape ``(len(qs), batch, out_dims)`` — the default gives an
        equal-tailed 95% credible band plus the median (what the
        reference's extended example assembles by hand from per-network
        predictions, extendedRegression.py:174-223)."""
        preds = self.predict(input_matrix, n, mesh=mesh)
        return np.quantile(preds, np.asarray(qs), axis=0)

    # -- reweighting ---------------------------------------------------------------

    def _log_posterior_weights(self, layers: Sequence[LayerSpec],
                               train_x, train_y, n: int,
                               likelihood: Optional[Likelihood]):
        """Per-network -(loglik + hyper probs), the reference's reweighting
        weight (predictor.py:157-202)."""
        model = Sequential(layers)
        params = self._thin(self.param_samples, n)
        hypers = self._thin(self.hyper_samples, n)
        lik_hypers = self._thin(self.lik_hyper_samples, n)

        def one(p, h, lh):
            total = jnp.asarray(0.0, self.dtype)
            if likelihood is not None and not isinstance(
                    likelihood, BernoulliLikelihood):
                # Bernoulli reweighting is prior-only, matching the
                # reference (likelihood.py:239-243)
                preds = model.apply(p, jnp.asarray(train_x, self.dtype))
                total = total + likelihood.log_likelihood(
                    preds, jnp.asarray(train_y, self.dtype), lh)
            total = total + model.log_hyper_prior(h, p)
            return -total

        return np.asarray(jax.jit(jax.vmap(one))(params, hypers, lik_hypers))

    def train_probs(self, train_x, train_y, n: int = 1,
                    likelihood: Optional[Likelihood] = None) -> np.ndarray:
        """Caches and returns the per-network negative log posterior terms
        used as reweighting baselines (reference ``trainProbs``,
        predictor.py:157-202)."""
        self._train_log_weights = self._log_posterior_weights(
            self.layers, train_x, train_y, n, likelihood)
        return self._train_log_weights

    def reweight(self, new_layers: Sequence[LayerSpec], train_x=None,
                 train_y=None, n: int = 1,
                 likelihood: Optional[Likelihood] = None) -> np.ndarray:
        """Importance weights for the ensemble under swapped priors.

        ``new_layers`` may also be a path to an architecture file (reference
        behavior, predictor.py:204-273). Returns normalized weights
        exp(logp_new - logp_old) / sum.
        """
        if self._train_log_weights is None:
            self._train_log_weights = self._log_posterior_weights(
                self.layers, train_x, train_y, n, likelihood)

        if isinstance(new_layers, str):
            with open(new_layers) as f:
                names = [line.strip() for line in f if line.strip()]
            new_layers = [self.registry[name]() for name in names]

        new_layers = list(new_layers)
        if not all(isinstance(lyr, LayerSpec) for lyr in new_layers):
            # catch the easy misuse (passing an input matrix where the
            # swapped-prior architecture goes) at the boundary instead of
            # an AttributeError deep inside Sequential
            raise TypeError(
                "reweight() takes the swapped-prior architecture as its "
                "first argument: a sequence of LayerSpec (or a path to an "
                f"architecture file), got {type(new_layers[0]).__name__} "
                "elements")
        new_log_weights = self._log_posterior_weights(
            new_layers, train_x, train_y, n, likelihood)
        weighting = np.exp(self._train_log_weights - new_log_weights)
        return weighting / np.sum(weighting)

    # -- diagnostics ---------------------------------------------------------------

    def _chain_blocks(self):
        """Contiguous ``(start, stop)`` slices of the chain-major sample
        axis, one per chain, or ``None`` when the store has no multichain
        structure (single chain, or a native npz store)."""
        if self.chain_index is None:
            return None
        idx = np.asarray(self.chain_index)
        if idx.size == 0 or len(np.unique(idx)) <= 1:
            return None
        change = np.nonzero(np.diff(idx))[0] + 1
        starts = np.concatenate([[0], change])
        stops = np.concatenate([change, [idx.size]])
        return list(zip(starts.tolist(), stops.tolist()))

    def autocorrelation(self, input_data, n_max: int) -> np.ndarray:
        """Mean normalized autocorrelation function of the predictions,
        averaged over test points with finite integrated time (reference
        predictor.py:275-292). One batched FFT over all test points.

        For multichain stores the ACF is computed per chain and averaged:
        the chain-major concatenated series is not a single Markov chain
        (each chain is demeaned separately, and no lag product crosses a
        chain boundary). Single-chain stores match the reference exactly.
        """
        preds = self.predict(input_data, n=1)
        output = np.squeeze(np.asarray(preds)).T  # (points, S)
        output = np.atleast_2d(output)

        blocks = self._chain_blocks() or [(0, output.shape[1])]
        acfs = []
        for a, b in blocks:
            seg = output[:, a:b]
            taus = autocorr.integrated_time_batch(seg)
            ok = ~np.isnan(taus)
            if np.any(ok):
                acfs.append(np.mean(
                    [autocorr.autocorr_function_1d(s) for s in seg[ok]],
                    axis=0))
        if not acfs:
            return np.zeros(min(n_max, output.shape[1]))
        min_len = min(len(a) for a in acfs)
        val_func = np.atleast_1d(np.mean([a[:min_len] for a in acfs], axis=0))
        if n_max < len(val_func):
            val_func = val_func[:n_max]
        return val_func

    def autocorrelation_length(self, input_data, n_max: int) -> float:
        """Mean integrated autocorrelation time over test points (reference
        predictor.py:294-312). One batched FFT over all test points.

        For multichain stores, taus are estimated per chain and averaged
        over (point, chain) pairs — a tau over the chain-major pooled
        series would treat between-chain mean differences as
        autocorrelation and inflate the estimate.
        """
        preds = self.predict(input_data, n=1)
        output = np.squeeze(np.asarray(preds)).T
        output = np.atleast_2d(output)

        blocks = self._chain_blocks() or [(0, output.shape[1])]
        taus = np.concatenate([
            autocorr.integrated_time_batch(output[:, a:b]) for a, b in blocks])
        ok = ~np.isnan(taus)
        val = float(taus[ok].mean()) if np.any(ok) else 0.0
        if val > n_max:
            print("Correlation time is greater than maximum accepted value.")
        return float(val)

    # -- raw access / statistics -----------------------------------------------------

    def extract_parameters(self):
        """Stacked parameter pytrees (leading axis = network)."""
        return self.param_samples

    def extract_hyper_parameters(self):
        """Hyper samples as a (S, H) matrix in reference order plus the raw
        pytrees."""
        mat = reference_format.ref_hyper_matrix(
            self.model, self.likelihood, self.hyper_samples,
            self.lik_hyper_samples)
        return np.asarray(mat)

    def parameter_statistics(self):
        """Per-parameter posterior means and sds (reference
        predictor.py:328-339)."""
        means = jax.tree.map(lambda v: np.asarray(v).mean(axis=0),
                             self.param_samples)
        sds = jax.tree.map(lambda v: np.asarray(v).std(axis=0),
                           self.param_samples)
        return means, sds

    def hyper_statistics(self):
        mat = self.extract_hyper_parameters()
        if mat.size == 0:
            return np.zeros(0), np.zeros(0)
        return mat.mean(axis=0), mat.std(axis=0)


# lowercase alias matching the reference class name (predictor.py:15)
predictor = Predictor
