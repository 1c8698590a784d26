"""Golden-value unit tests for metrics (VERDICT round-1 weak #4).

Expected values are computed with plain NumPy, re-deriving the reference
semantics (/root/reference/tensorBNN/metrics.py:30-141): un-normalize both
predictions and targets with (mean, sd), optionally exp-rescale, reduce.
One deliberate fix vs. the reference: its SquaredError forgets to exp the
*validation predictions* under scaleExp (reference metrics.py:45-48 exps
only train preds and both target sets); this build exps all four tensors,
consistent with its own PercentError/Accuracy.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tensorbnn_tpu.metrics import Accuracy, PercentError, SquaredError

rng = np.random.default_rng(7)
PT = rng.normal(size=(12, 1)).astype(np.float32)
PV = rng.normal(size=(8, 1)).astype(np.float32)
RT = rng.normal(size=(12,)).astype(np.float32)
RV = rng.normal(size=(8,)).astype(np.float32)


def unscale(a, mean, sd, scale_exp):
    a = a * sd + mean
    return np.exp(a) if scale_exp else a


@pytest.mark.parametrize("mean,sd,scale_exp", [
    (0.0, 1.0, False),
    (1.5, 0.3, False),
    (0.2, 0.4, True),
])
def test_squared_error_golden(mean, sd, scale_exp):
    m = SquaredError(scale_exp=scale_exp, mean=mean, sd=sd)
    m.calculate(jnp.asarray(PT), jnp.asarray(PV),
                jnp.asarray(RT), jnp.asarray(RV))
    pt = unscale(PT, mean, sd, scale_exp)
    rt = unscale(RT, mean, sd, scale_exp).reshape(pt.shape)
    pv = unscale(PV, mean, sd, scale_exp)
    rv = unscale(RV, mean, sd, scale_exp).reshape(pv.shape)
    np.testing.assert_allclose(m.train, np.mean((pt - rt) ** 2), rtol=1e-5)
    np.testing.assert_allclose(m.validate, np.mean((pv - rv) ** 2),
                               rtol=1e-5)
    assert "squared error" in m.display()


@pytest.mark.parametrize("mean,sd,scale_exp", [
    (0.0, 1.0, False),
    (2.0, 0.5, False),
    (0.1, 0.2, True),
])
def test_percent_error_golden(mean, sd, scale_exp):
    m = PercentError(scale_exp=scale_exp, mean=mean, sd=sd)
    m.calculate(jnp.asarray(PT), jnp.asarray(PV),
                jnp.asarray(RT), jnp.asarray(RV))
    pt = unscale(PT, mean, sd, scale_exp)
    rt = unscale(RT, mean, sd, scale_exp).reshape(pt.shape)
    pv = unscale(PV, mean, sd, scale_exp)
    rv = unscale(RV, mean, sd, scale_exp).reshape(pv.shape)
    np.testing.assert_allclose(
        m.train, np.mean(np.abs((pt - rt) / rt)) * 100.0, rtol=1e-4)
    np.testing.assert_allclose(
        m.validate, np.mean(np.abs((pv - rv) / rv)) * 100.0, rtol=1e-4)
    assert "percent error" in m.display()


def test_accuracy_golden():
    # binary labels + probabilities, no un-normalization
    pt = np.array([[0.9], [0.2], [0.6], [0.4]], np.float32)
    rt = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    pv = np.array([[0.1], [0.8]], np.float32)
    rv = np.array([0.0, 1.0], np.float32)
    m = Accuracy()
    m.calculate(jnp.asarray(pt), jnp.asarray(pv),
                jnp.asarray(rt), jnp.asarray(rv))
    # round(pt) = [1,0,1,0] vs [1,0,0,0] -> 3/4 correct
    np.testing.assert_allclose(m.train, 0.75)
    np.testing.assert_allclose(m.validate, 1.0)
    assert "accuracy" in m.display()


def test_accuracy_unscaling_path():
    # with (mean, sd) the rounding happens on the un-normalized scale
    pt = np.array([[-1.0], [1.0]], np.float32)   # unscaled: 0.25, 0.75
    rt = np.array([0.0, 1.0], np.float32)        # labels stored normalized
    m = Accuracy(mean=0.5, sd=0.25)
    m.calculate(jnp.asarray(pt), jnp.asarray(pt),
                jnp.asarray(rt), jnp.asarray(rt))
    rt_u = rt * 0.25 + 0.5                       # 0.5, 0.75
    pt_u = pt[:, 0] * 0.25 + 0.5
    want = 1.0 - np.mean(np.abs(rt_u - np.round(pt_u)))
    np.testing.assert_allclose(m.train, want, rtol=1e-6)


def test_percent_error_zero_target_is_nonfinite_kept_quirk():
    """Kept reference quirk (metrics.py:83-86): a target value of 0 makes
    the percent error non-finite — the division is unguarded, matching the
    reference's reported numbers exactly (documented in PercentError)."""
    pt = np.array([[1.0], [2.0]], np.float32)
    rt = np.array([0.0, 2.0], np.float32)        # one zero target
    m = PercentError()
    m.calculate(jnp.asarray(pt), jnp.asarray(pt),
                jnp.asarray(rt), jnp.asarray(rt))
    assert not np.isfinite(m.train)
