from moleculesde_tpu.ops.fourier import (
    gaussian_fourier_projection,
    gaussian_smearing,
    gaussian_rbf,
    cosine_cutoff,
    shifted_softplus,
)
from moleculesde_tpu.ops.frames import coord2basis, frame_features, EPSILON

__all__ = [
    "gaussian_fourier_projection",
    "gaussian_smearing",
    "gaussian_rbf",
    "cosine_cutoff",
    "shifted_softplus",
    "coord2basis",
    "frame_features",
    "EPSILON",
]
