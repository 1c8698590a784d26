"""The reference's bundled examples import ``tensorBNN.networkFinal``
(trainRegression.py:12) — a module that does not exist in the reference
itself (SURVEY.md #2.3.7). Provided here so those scripts run unmodified."""

from tensorBNN.network import Network, network  # noqa: F401
