from moleculesde_tpu.ops.common import EPSILON, safe_norm
from moleculesde_tpu.ops.fourier import (
    gaussian_fourier_projection,
    gaussian_smearing,
    gaussian_rbf,
    cosine_cutoff,
    shifted_softplus,
)

__all__ = [
    "gaussian_fourier_projection",
    "gaussian_smearing",
    "gaussian_rbf",
    "cosine_cutoff",
    "shifted_softplus",
    "safe_norm",
    "EPSILON",
]
