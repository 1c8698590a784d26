"""Drop-in compatibility shim: the reference's import surface over the
TPU-native framework.

Reference user scripts import ``tensorBNN.network`` / ``tensorBNN.layer`` /
``tensorBNN.activationFunctions`` / ``tensorBNN.likelihood`` /
``tensorBNN.metrics`` / ``tensorBNN.predictor`` / ``tensorBNN.BNN_functions``
(and the examples import the misnamed ``tensorBNN.networkFinal``,
/root/reference/Examples/trainRegression.py:12). This package provides all
of them with the reference's constructor signatures (camelCase kwargs,
TensorFlow dtype objects accepted), backed by :mod:`tensorbnn_tpu` — so a
reference user switches frameworks by switching nothing.
"""
