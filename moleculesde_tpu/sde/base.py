"""Forward / reverse SDE math for score-based diffusion (VE / VP / sub-VP).

One broadcasting-agnostic library replacing the reference's two parallel
copies (reference Geom3D/models/MoleculeSDE/SDE_sparse.py — per-node ``[:,None]``
broadcasting — and SDE_dense.py — per-graph ``[:,None,None]`` broadcasting).
Here every method returns time-shaped coefficients and broadcasts them to the
rank of ``x`` automatically, so the same object serves the sparse 2D->3D
position path and the dense 3D->2D node/adjacency path.

All methods are pure functions of (x, t) with explicit PRNG keys, jit/scan
friendly: discrete lookup tables are static constants baked at construction.
Formulas match the reference exactly:

- VPSDE:    SDE_sparse.py:105-169 (linear-beta DDPM; closed-form marginal)
- VESDE:    SDE_sparse.py:172-230 (geometric sigma schedule; SMLD discretize)
- SubVPSDE: SDE_sparse.py:233-275 (note: the reference's sub-VP ``marginal_prob``
  returns ``std = 1 - exp(2*lmc)`` *without* a sqrt — preserved verbatim)
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _bcast(coeff: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a time-shaped coefficient against ``x`` by appending axes."""
    coeff = jnp.asarray(coeff)
    extra = x.ndim - coeff.ndim
    if extra <= 0:
        return coeff
    return coeff.reshape(coeff.shape + (1,) * extra)


def get_beta_schedule(
    beta_schedule: str, *, beta_min: float, beta_max: float, num_diffusion_timesteps: int
) -> np.ndarray:
    """Discrete beta schedules (reference SDE_model_2D_to_3D.py:13-32)."""
    def sigmoid(v):
        return 1.0 / (np.exp(-v) + 1.0)

    n = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_min ** 0.5, beta_max ** 0.5, n, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_min, beta_max, n, dtype=np.float64)
    elif beta_schedule == "const":
        betas = beta_max * np.ones(n, dtype=np.float64)
    elif beta_schedule == "jsd":
        betas = 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    elif beta_schedule == "sigmoid":
        betas = sigmoid(np.linspace(-6, 6, n)) * (beta_max - beta_min) + beta_min
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (n,)
    return betas.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class SDE:
    """Base SDE. ``N`` discretization steps, terminal time ``T`` = 1."""

    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    # --- to be overridden -------------------------------------------------
    def sde(self, x: jnp.ndarray, t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def marginal_prob(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean and std of the perturbation kernel p_t(x_t | x_0).

        ``std`` has the shape of ``t``; ``mean`` has the shape of ``x``.
        """
        raise NotImplementedError

    def prior_sampling(self, key: jax.Array, shape) -> jnp.ndarray:
        return jax.random.normal(key, shape)

    def prior_sampling_sym(self, key: jax.Array, shape) -> jnp.ndarray:
        """Symmetric prior noise for adjacency matrices (ref SDE_dense.py:148-150)."""
        z = jax.random.normal(key, shape)
        z = jnp.triu(z, k=1)
        return z + jnp.swapaxes(z, -1, -2)

    def prior_logp(self, z: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # --- shared machinery ---------------------------------------------------
    def discretize(self, x, t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Euler-Maruyama default: x_{i+1} = x_i + f + G z (ref SDE_sparse.py:48-62)."""
        dt = 1.0 / self.N
        drift, diffusion = self.sde(x, t)
        return drift * dt, diffusion * jnp.sqrt(dt)

    def reverse_sde(self, x, t, score, probability_flow: bool = False):
        """Drift/diffusion of the reverse-time SDE given a score estimate
        (functional form of ref SDE_sparse.py:85-92)."""
        drift, diffusion = self.sde(x, t)
        drift = drift - _bcast(diffusion, x) ** 2 * score * (0.5 if probability_flow else 1.0)
        diffusion = jnp.zeros_like(diffusion) if probability_flow else diffusion
        return drift, diffusion

    def reverse_discretize(self, x, t, score, probability_flow: bool = False):
        """Discretized reverse-diffusion rule (functional form of ref
        SDE_sparse.py:94-100)."""
        f, G = self.discretize(x, t)
        rev_f = f - _bcast(G, x) ** 2 * score * (0.5 if probability_flow else 1.0)
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G

    def timestep_of(self, t: jnp.ndarray) -> jnp.ndarray:
        return (t * (self.N - 1) / self.T).astype(jnp.int32)

    def corrector_alpha(self, t: jnp.ndarray) -> jnp.ndarray:
        """alpha_i used by the Langevin corrector step size; 1 for VE
        (ref inference 2D_to_3D script l.198-202)."""
        return jnp.ones_like(t)


@dataclasses.dataclass(frozen=True)
class VPSDE(SDE):
    """Variance-preserving SDE (linear beta; ref SDE_sparse.py:105-169)."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def discrete_betas(self) -> jnp.ndarray:
        return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N, self.N)

    @property
    def alphas(self) -> jnp.ndarray:
        return 1.0 - self.discrete_betas

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * _bcast(beta_t, x) * x
        return drift, jnp.sqrt(beta_t)

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(lmc), x) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * np.log(2 * np.pi) - jnp.sum(z ** 2, axis=axes) / 2.0

    def discretize(self, x, t):
        """DDPM discretization (ref SDE_sparse.py:154-162)."""
        ts = self.timestep_of(t)
        beta = self.discrete_betas[ts]
        alpha = self.alphas[ts]
        f = _bcast(jnp.sqrt(alpha), x) * x - x
        return f, jnp.sqrt(beta)

    def transition(self, x, t, dt):
        """Mean/std of the (negative-dt) transition kernel (ref SDE_sparse.py:164-169)."""
        lmc = 0.25 * dt * (2 * self.beta_min + (2 * t + dt) * (self.beta_max - self.beta_min))
        mean = _bcast(jnp.exp(-lmc), x) * x
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * lmc))
        return mean, std

    def corrector_alpha(self, t):
        return self.alphas[self.timestep_of(t)]


@dataclasses.dataclass(frozen=True)
class VESDE(SDE):
    """Variance-exploding SDE (geometric sigma; ref SDE_sparse.py:172-230)."""

    sigma_min: float = 0.01
    sigma_max: float = 50.0

    @property
    def discrete_sigmas(self) -> jnp.ndarray:
        return jnp.exp(
            jnp.linspace(np.log(self.sigma_min), np.log(self.sigma_max), self.N)
        )

    def sde(self, x, t):
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        drift = jnp.zeros_like(x)
        diffusion = sigma * np.sqrt(2 * (np.log(self.sigma_max) - np.log(self.sigma_min)))
        return drift, diffusion

    def marginal_prob(self, x, t):
        std = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        return x, std

    def prior_sampling(self, key, shape):
        # Reference samples N(0, I) here too (SDE_sparse.py:201-202) rather
        # than N(0, sigma_max^2 I); preserved for parity.
        return jax.random.normal(key, shape)

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * np.log(2 * np.pi * self.sigma_max ** 2) - jnp.sum(
            z ** 2, axis=axes
        ) / (2 * self.sigma_max ** 2)

    def discretize(self, x, t):
        """SMLD (NCSN) discretization (ref SDE_sparse.py:214-222)."""
        ts = self.timestep_of(t)
        sigma = self.discrete_sigmas[ts]
        adjacent = jnp.where(ts == 0, jnp.zeros_like(sigma), self.discrete_sigmas[ts - 1])
        f = jnp.zeros_like(x)
        G = jnp.sqrt(sigma ** 2 - adjacent ** 2)
        return f, G

    def transition(self, x, t, dt):
        var = (
            jnp.square(self.sigma_min * (self.sigma_max / self.sigma_min) ** t)
            - jnp.square(self.sigma_min * (self.sigma_max / self.sigma_min) ** (t + dt))
        )
        return x, jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class SubVPSDE(SDE):
    """Sub-VP SDE (ref SDE_sparse.py:233-275)."""

    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def discrete_betas(self) -> jnp.ndarray:
        return jnp.linspace(self.beta_min / self.N, self.beta_max / self.N, self.N)

    @property
    def alphas(self) -> jnp.ndarray:
        return 1.0 - self.discrete_betas

    def sde(self, x, t):
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        drift = -0.5 * _bcast(beta_t, x) * x
        discount = 1.0 - jnp.exp(-2 * self.beta_min * t - (self.beta_max - self.beta_min) * t ** 2)
        return drift, jnp.sqrt(beta_t * discount)

    def marginal_prob(self, x, t):
        lmc = -0.25 * t ** 2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min
        mean = _bcast(jnp.exp(lmc), x) * x
        # NOTE: no sqrt — verbatim reference behavior (SDE_sparse.py:262).
        std = 1.0 - jnp.exp(2.0 * lmc)
        return mean, std

    def prior_logp(self, z):
        n = np.prod(z.shape[1:])
        axes = tuple(range(1, z.ndim))
        return -n / 2.0 * np.log(2 * np.pi) - jnp.sum(z ** 2, axis=axes) / 2.0

    def corrector_alpha(self, t):
        return self.alphas[self.timestep_of(t)]


def make_sde(sde_type: str, beta_min: float, beta_max: float, N: int) -> SDE:
    """Factory matching the reference's SDE selection convention, where the
    ``beta_min/beta_max`` flags double as VE sigma bounds
    (reference SDE_model_2D_to_3D.py:90-93)."""
    kind = sde_type.split("_")[0]  # "VE_test" -> "VE"
    if kind == "VE":
        return VESDE(sigma_min=beta_min, sigma_max=beta_max, N=N)
    if kind == "VP":
        return VPSDE(beta_min=beta_min, beta_max=beta_max, N=N)
    if kind in ("subVP", "SUBVP", "sub"):
        return SubVPSDE(beta_min=beta_min, beta_max=beta_max, N=N)
    raise ValueError(f"unknown SDE type: {sde_type}")
