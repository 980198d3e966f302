from gpu_se_tpu.distributions.gaussian_sum import (
    DeterministicGaussianSum,
    GaussianSum,
    MultivariateGaussianSum,
)

__all__ = ["GaussianSum", "MultivariateGaussianSum", "DeterministicGaussianSum"]
