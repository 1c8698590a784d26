"""Layer/model tests: forward-pass semantics, prior golden values vs a NumPy
oracle of the reference math, pytree structure, ref-format round trips."""

import math

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from tensorbnn_tpu import (
    CauchyDenseLayer,
    GaussianDenseLayer,
    LeakyRelu,
    Prelu,
    Sequential,
    Sigmoid,
    SquarePrelu,
    Tanh,
)
from tests.test_distributions import ref_multivariate_log_prob


def _normal_logpdf(x, loc, scale):
    return (-0.5 * ((x - loc) / scale) ** 2
            - math.log(scale) - 0.5 * math.log(2 * math.pi))


def make_mlp(widths=(1, 10, 10, 10, 1), key=0):
    model = Sequential()
    for i in range(len(widths) - 1):
        model.add(GaussianDenseLayer(widths[i], widths[i + 1]))
        if i < len(widths) - 2:
            model.add(Tanh())
    params, hypers = model.init(jax.random.key(key))
    return model, params, hypers


def test_dense_apply_matches_reference_column_major():
    """Batch-major x @ W + b equals the reference's W_ref @ x_T + b_ref
    transposed back (reference layer.py:266-279)."""
    layer = GaussianDenseLayer(3, 4)
    params, _ = layer.init(jax.random.key(0))
    x = np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32)
    got = np.asarray(layer.apply(params, x))

    w_ref, b_ref = [np.asarray(t) for t in layer.ref_param_tensors(params)]
    want = (w_ref @ x.T + b_ref).T
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_gaussian_dense_log_prior_golden():
    layer = GaussianDenseLayer(2, 3)
    params, _ = layer.init(jax.random.key(1))
    hypers = {"w_loc": jnp.asarray(0.1), "w_scale": jnp.asarray(1.2),
              "b_loc": jnp.asarray(-0.2), "b_scale": jnp.asarray(0.9)}
    got = float(layer.log_prior(hypers, params))
    # oracle: reference layer.py:346-377 with sd = hyper**2
    want = ref_multivariate_log_prob(1.2 ** 2, 0.1, np.asarray(params["w"]))
    want += ref_multivariate_log_prob(0.9 ** 2, -0.2, np.asarray(params["b"]))
    assert got == pytest.approx(want, rel=1e-4)


def test_gaussian_dense_log_hyper_prior_golden():
    layer = GaussianDenseLayer(2, 3)
    params, _ = layer.init(jax.random.key(2))
    hypers = {"w_loc": jnp.asarray(0.1), "w_scale": jnp.asarray(1.2),
              "b_loc": jnp.asarray(-0.2), "b_scale": jnp.asarray(0.9)}
    got = float(layer.log_hyper_prior(hypers, params))
    # oracle: reference layer.py:379-422 — hyperpriors N(0,.1)/N(1,.1)
    # evaluated at (loc, scale**2), plus the conditional prior.
    want = _normal_logpdf(0.1, 0.0, 0.1) + _normal_logpdf(1.2 ** 2, 1.0, 0.1)
    want += _normal_logpdf(-0.2, 0.0, 0.1) + _normal_logpdf(0.9 ** 2, 1.0, 0.1)
    want += ref_multivariate_log_prob(1.2 ** 2, 0.1, np.asarray(params["w"]))
    want += ref_multivariate_log_prob(0.9 ** 2, -0.2, np.asarray(params["b"]))
    assert got == pytest.approx(want, rel=1e-4)


def test_cauchy_dense_log_prior_uses_compat_by_default():
    layer = CauchyDenseLayer(2, 2)
    params, hypers = layer.init(jax.random.key(3))
    got = float(layer.log_prior(hypers, params))
    g = float(hypers["w_scale"]) ** 2
    w = np.asarray(params["w"], np.float64)
    b = np.asarray(params["b"], np.float64)
    # oracle of reference cauchyLogProb (sign-flipped), layer.py:166-197
    def compat(x):
        return np.sum(np.log(1 + (x / g) ** 2) - math.log(math.pi * g))
    assert got == pytest.approx(compat(w) + compat(b), rel=1e-4)

    proper = CauchyDenseLayer(2, 2, proper=True)
    got_proper = float(proper.log_prior(hypers, params))
    assert got_proper != pytest.approx(got, rel=1e-3)


def test_prelu_and_squareprelu_forward():
    x = np.array([[-2.0, 3.0], [1.0, -1.0]], np.float32)
    prelu = Prelu(in_dim=2, alpha=0.5)
    p, _ = prelu.init(jax.random.key(0))
    got = np.asarray(prelu.apply(p, x))
    np.testing.assert_allclose(got, [[-1.0, 3.0], [1.0, -0.5]], rtol=1e-6)

    sq = SquarePrelu(in_dim=2, alpha=0.5)
    p2, _ = sq.init(jax.random.key(0))
    got2 = np.asarray(sq.apply(p2, x))
    np.testing.assert_allclose(got2, [[-0.5, 3.0], [1.0, -0.25]], rtol=1e-6)


def test_leaky_relu_fixed_alpha():
    lr = LeakyRelu(alpha=0.1)
    x = np.array([[-1.0, 2.0]], np.float32)
    np.testing.assert_allclose(np.asarray(lr.apply({}, x)),
                               [[-0.1, 2.0]], rtol=1e-6)
    assert not lr.has_params  # alpha is not a chain state (SURVEY.md #2.3)


def test_sequential_structure_and_apply():
    model, params, hypers = make_mlp()
    x = np.linspace(-2, 2, 11, dtype=np.float32)[:, None]
    out = model.apply(params, x)
    assert out.shape == (11, 1)
    # stateless layers contribute empty dicts; pytree flattens cleanly
    flat, _ = jax.flatten_util.ravel_pytree(params)
    n_expected = (1 * 10 + 10) + (10 * 10 + 10) + (10 * 10 + 10) + (10 * 1 + 1)
    assert flat.shape == (n_expected,)

    lp = model.log_prior(hypers, params)
    lhp = model.log_hyper_prior(hypers, params)
    assert np.isfinite(float(lp)) and np.isfinite(float(lhp))


def test_dense_ref_roundtrip():
    layer = GaussianDenseLayer(3, 4)
    params, hypers = layer.init(jax.random.key(5))
    tensors = layer.ref_param_tensors(params)
    assert tensors[0].shape == (4, 3) and tensors[1].shape == (4, 1)
    back = layer.params_from_ref(tensors)
    np.testing.assert_allclose(np.asarray(back["w"]),
                               np.asarray(params["w"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(back["b"]),
                               np.asarray(params["b"]), rtol=1e-6)
    hv = layer.ref_hyper_values(hypers)
    hb = layer.hypers_from_ref(hv)
    assert float(hb["w_scale"]) == float(hypers["w_scale"])


def test_sigmoid_tanh_match_numpy():
    x = np.linspace(-3, 3, 7, dtype=np.float32)[None, :]
    np.testing.assert_allclose(np.asarray(Sigmoid().apply({}, x)),
                               1 / (1 + np.exp(-x)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(Tanh().apply({}, x)),
                               np.tanh(x), rtol=1e-5)


def test_make_mlp_factory():
    from tensorbnn_tpu.models.mlp import make_mlp
    m = make_mlp((1, 10, 10, 1), activation="tanh", prior="gaussian")
    assert m.layer_names == ["denseGaussian", "tanh", "denseGaussian",
                             "tanh", "denseGaussian"]
    m2 = make_mlp((2, 8, 1), activation="squareprelu", prior="cauchy",
                  final_activation="sigmoid")
    assert m2.layer_names == ["dense", "squareprelu", "dense", "sigmoid"]
    params, hypers = m2.init(jax.random.key(0))
    out = m2.apply(params, jnp.zeros((3, 2)))
    assert out.shape == (3, 1)


def test_network_rejects_nonfinite_data():
    import jax.numpy as jnp
    import pytest

    from tensorbnn_tpu.network import Network

    x = np.linspace(-1, 1, 5)
    y = np.sin(x)
    bad_y = y.copy()
    bad_y[2] = np.nan
    with pytest.raises(ValueError, match="non-finite"):
        Network(jnp.float32, 1, x, bad_y, x, y)
    bad_x = x.copy()
    bad_x[0] = np.inf
    with pytest.raises(ValueError, match="non-finite"):
        Network(jnp.float32, 1, bad_x, y, x, y)


def test_network_rejects_mismatched_input_dims():
    import jax.numpy as jnp
    import pytest

    from tensorbnn_tpu.network import Network

    x = np.zeros((6, 3), np.float32)   # width 3
    y = np.zeros(6, np.float32)
    with pytest.raises(ValueError, match="input_dims"):
        Network(jnp.float32, 2, x, y, x, y)


def test_network_validates_device_arrays_without_transfer():
    """Finiteness validation accepts device-resident jnp arrays (checked
    device-side) and rejects non-finite ones; integer data is skipped."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from tensorbnn_tpu.network import Network

    x = jnp.linspace(-1, 1, 8).reshape(8, 1)
    y = jnp.sin(x[:, 0])
    Network(jnp.float32, 1, x, y, x, y)        # device arrays OK

    bad = y.at[3].set(jnp.nan)
    with pytest.raises(ValueError, match="non-finite"):
        Network(jnp.float32, 1, x, bad, x, y)

    xi = np.arange(8, dtype=np.int64).reshape(8, 1)
    Network(jnp.float32, 1, xi, np.arange(8.0), xi, np.arange(8.0))


def test_host_unraveler_matches_ravel_pytree():
    """The numpy host unraveler must reproduce ravel_pytree's layout
    exactly (the streaming writer depends on it)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tensorbnn_tpu import (FixedGaussianLikelihood, GaussianDenseLayer,
                               SquarePrelu, Tanh)
    from tensorbnn_tpu.models.sequential import Sequential
    from tensorbnn_tpu.sampler.potential import flatten_state, host_unraveler

    model = Sequential([GaussianDenseLayer(2, 5), SquarePrelu(5), Tanh(),
                        GaussianDenseLayer(5, 1)])
    params, hypers = model.init(jax.random.key(0))
    lik = FixedGaussianLikelihood(sd=0.1)
    flat = flatten_state(params, hypers, lik.init_hypers())

    rng = np.random.default_rng(0)
    vec_t = rng.normal(size=flat.theta.size).astype(np.float32)
    vec_e = rng.normal(size=flat.eta.size).astype(np.float32)

    want_t = jax.tree.map(np.asarray, flat.unravel_theta(jnp.asarray(vec_t)))
    got_t = host_unraveler(params)(vec_t)
    jax.tree.map(np.testing.assert_array_equal, got_t, want_t)

    want_e = jax.tree.map(np.asarray, flat.unravel_eta(jnp.asarray(vec_e)))
    got_e = host_unraveler((hypers, lik.init_hypers()))(vec_e)
    jax.tree.map(np.testing.assert_array_equal, got_e, want_e)
