from gpu_se_tpu.filters import gs_ukf, particle, resampling
from gpu_se_tpu.filters.gs_ukf import GaussianSumUnscentedKalmanFilter, GSUKFState
from gpu_se_tpu.filters.particle import ParticleFilter, PFState
from gpu_se_tpu.filters.resampling import (
    systematic_resample,
    systematic_resample_indices,
)

# The reference distinguishes serial vs parallel classes
# (/root/reference/filter/__init__.py:1-7); under JAX one implementation
# serves both, so the Parallel names are aliases kept for API parity.
ParallelParticleFilter = ParticleFilter
ParallelGaussianSumUnscentedKalmanFilter = GaussianSumUnscentedKalmanFilter

__all__ = [
    "particle",
    "gs_ukf",
    "resampling",
    "ParticleFilter",
    "ParallelParticleFilter",
    "PFState",
    "GaussianSumUnscentedKalmanFilter",
    "ParallelGaussianSumUnscentedKalmanFilter",
    "GSUKFState",
    "systematic_resample",
    "systematic_resample_indices",
]
