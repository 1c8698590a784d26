"""Training/validation metrics evaluated during sampling.

Re-implements the reference metric protocol (/root/reference/tensorBNN/
metrics.py) over batch-major predictions as pure jnp math: each metric
un-normalizes with (mean, sd), optionally exp-rescales, computes its score on
train and validation splits, and can render a display string. The driver
calls these on host at display epochs (reference network.py:593-602).
"""

from __future__ import annotations

import jax.numpy as jnp


class Metric:
    """Base metric (reference metrics.py:4-27)."""

    def __init__(self, scale_exp: bool = False, mean=0.0, sd=1.0):
        self.scale_exp = scale_exp
        self.mean = mean
        self.sd = sd

    def _unscale(self, preds, real):
        preds = preds * self.sd + self.mean
        real = real * self.sd + self.mean
        if self.scale_exp:
            preds = jnp.exp(preds)
            real = jnp.exp(real)
        return preds, jnp.reshape(real, preds.shape)

    def calculate(self, preds_train, preds_validate, real_train,
                  real_validate):
        raise NotImplementedError

    def display(self) -> str:
        raise NotImplementedError


class SquaredError(Metric):
    """Mean squared error (reference metrics.py:30-68)."""

    def calculate(self, preds_train, preds_validate, real_train,
                  real_validate):
        pt, rt = self._unscale(preds_train, real_train)
        pv, rv = self._unscale(preds_validate, real_validate)
        self.train = float(jnp.mean((pt - rt) ** 2))
        self.validate = float(jnp.mean((pv - rv) ** 2))

    def display(self):
        return (f"training squared error{self.train: 9.5f} "
                f"validation squared error{self.validate: 9.5f}")


class PercentError(Metric):
    """Mean absolute percent error (reference metrics.py:70-108).

    Kept quirk (SURVEY.md #2.3-style decision): the reference divides by
    the (un-normalized) target values with no guard, so any target equal
    to 0 makes the whole mean inf/NaN (reference metrics.py:83-86,
    100-103). Replicated as-is — percent error is only meaningful on
    targets bounded away from zero, and silently substituting a guard
    would change reported numbers vs the reference. Use
    :class:`SquaredError` for data with zero-crossing targets.
    """

    def calculate(self, preds_train, preds_validate, real_train,
                  real_validate):
        pt, rt = self._unscale(preds_train, real_train)
        pv, rv = self._unscale(preds_validate, real_validate)
        self.train = float(jnp.mean(jnp.abs((pt - rt) / rt)) * 100.0)
        self.validate = float(jnp.mean(jnp.abs((pv - rv) / rv)) * 100.0)

    def display(self):
        return (f"training percent error{self.train: 7.3f} "
                f"validation percent error{self.validate: 7.3f}")


class Accuracy(Metric):
    """Binary accuracy via rounding (reference metrics.py:110-141)."""

    def calculate(self, preds_train, preds_validate, real_train,
                  real_validate):
        pt, rt = self._unscale(preds_train, real_train)
        pv, rv = self._unscale(preds_validate, real_validate)
        self.train = float(1.0 - jnp.mean(jnp.abs(rt - jnp.round(pt))))
        self.validate = float(1.0 - jnp.mean(jnp.abs(rv - jnp.round(pv))))

    def display(self):
        return (f"training accuracy{self.train: 9.5f} "
                f"validation accuracy{self.validate: 9.5f}")


class MulticlassAccuracy(Accuracy):
    """Argmax accuracy over probability rows (new beyond the reference,
    paired with CategoricalLikelihood; the reference's Accuracy is binary
    rounding, metrics.py:110-141). Real values may be class ids or
    one-hot rows; unscaling options do not apply. Shares Accuracy's
    display format."""

    def calculate(self, preds_train, preds_validate, real_train,
                  real_validate):
        def acc(preds, real):
            pred_cls = jnp.argmax(preds, axis=-1)
            real = jnp.asarray(real)
            # one-hot only when the trailing axis matches the class
            # count; an (N, 1) column of ids flattens to ids
            if real.ndim == jnp.ndim(preds) and \
                    real.shape[-1] == jnp.shape(preds)[-1]:
                real = jnp.argmax(real, axis=-1)
            else:
                real = jnp.reshape(real, pred_cls.shape)
            return float(jnp.mean(pred_cls == real.astype(pred_cls.dtype)))
        self.train = acc(preds_train, real_train)
        self.validate = acc(preds_validate, real_validate)
