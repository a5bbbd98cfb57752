"""neural_ode_features_tpu — a TPU-native neural-ODE feature framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``fabiocarrara/neural-ode-features`` (see SURVEY.md): ODE-Net / ResNet image
models on MNIST & CIFAR-10, an adaptive on-device dopri5 integrator with
per-sample error control and NFE accounting, adjoint training, continuous
feature extraction at arbitrary t ∈ [0, 1], and data-parallel execution over
a TPU mesh.
"""

__version__ = "0.1.0"

from . import solver  # noqa: F401

__all__ = ["solver", "__version__"]
