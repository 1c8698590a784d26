"""tensorbnn_tpu: a TPU-native Bayesian-neural-network HMC framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
alpha-davidson/TensorBNN (see SURVEY.md): dense Bayesian MLPs sampled with a
two-block Gibbs-within-HMC scheme (weight-space HMC alternating with
hyperparameter HMC), GP-UCB step-size/leapfrog adaptation plus dual
averaging, posterior-ensemble prediction with reweighting and
autocorrelation/ESS diagnostics, MAP pretraining, and chain/data parallelism
over TPU meshes.
"""

from tensorbnn_tpu import distributions
from tensorbnn_tpu.likelihoods import (
    BernoulliLikelihood,
    CategoricalLikelihood,
    FixedGaussianLikelihood,
    GaussianLikelihood,
    Likelihood,
)
from tensorbnn_tpu.models.layers import (
    LAYER_REGISTRY,
    CauchyDenseLayer,
    DenseLayer,
    Elu,
    Exp,
    GaussianDenseLayer,
    LayerSpec,
    LeakyRelu,
    Prelu,
    Relu,
    Sigmoid,
    Softmax,
    SquarePrelu,
    Tanh,
)
from tensorbnn_tpu.models.sequential import Sequential

__version__ = "0.1.0"

__all__ = [
    "distributions",
    "Likelihood",
    "GaussianLikelihood",
    "FixedGaussianLikelihood",
    "BernoulliLikelihood",
    "CategoricalLikelihood",
    "LayerSpec",
    "GaussianDenseLayer",
    "CauchyDenseLayer",
    "DenseLayer",
    "Exp",
    "Relu",
    "Sigmoid",
    "Tanh",
    "Elu",
    "Softmax",
    "LeakyRelu",
    "Prelu",
    "SquarePrelu",
    "LAYER_REGISTRY",
    "Sequential",
    "__version__",
]
