import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.sde import VESDE, VPSDE, SubVPSDE, get_beta_schedule, make_sde


def test_vp_marginal_closed_form():
    sde = VPSDE(beta_min=0.2, beta_max=1.0, N=1000)
    t = jnp.array([0.0, 0.5, 1.0])
    x = jnp.ones((3, 4))
    mean, std = sde.marginal_prob(x, t)
    lmc = -0.25 * t**2 * (1.0 - 0.2) - 0.5 * t * 0.2
    np.testing.assert_allclose(
        np.asarray(mean), np.exp(np.asarray(lmc))[:, None] * np.ones((3, 4)), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(std), np.sqrt(1 - np.exp(2 * np.asarray(lmc))), rtol=1e-6)
    # t=0: no noise; std ~ 0
    assert float(std[0]) == pytest.approx(0.0, abs=1e-6)


def test_ve_marginal_geometric():
    sde = VESDE(sigma_min=0.2, sigma_max=1.0, N=1000)
    t = jnp.array([0.0, 1.0])
    x = jnp.ones((2, 3))
    mean, std = sde.marginal_prob(x, t)
    np.testing.assert_allclose(np.asarray(mean), np.ones((2, 3)))
    np.testing.assert_allclose(np.asarray(std), [0.2, 1.0], rtol=1e-6)


def test_subvp_marginal_matches_reference_quirk():
    # reference SDE_sparse.py:262 returns std WITHOUT sqrt
    sde = SubVPSDE(beta_min=0.1, beta_max=20.0, N=100)
    t = jnp.array([0.7])
    _, std = sde.marginal_prob(jnp.ones((1, 2)), t)
    lmc = -0.25 * 0.49 * 19.9 - 0.5 * 0.7 * 0.1
    np.testing.assert_allclose(float(std[0]), 1 - np.exp(2 * lmc), rtol=1e-5)


def test_vp_discretize_ddpm():
    sde = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    t = jnp.array([1.0])  # last timestep
    x = jnp.full((1, 2), 3.0)
    f, G = sde.discretize(x, t)
    beta_N = 20.0 / 1000
    np.testing.assert_allclose(float(G[0]), np.sqrt(beta_N), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(f), (np.sqrt(1 - beta_N) - 1) * 3.0 * np.ones((1, 2)), rtol=1e-5
    )


def test_ve_discretize_smld():
    sde = VESDE(sigma_min=0.01, sigma_max=50.0, N=1000)
    # timestep 0 -> adjacent sigma is 0
    t0 = jnp.array([0.0])
    _, G0 = sde.discretize(jnp.zeros((1, 3)), t0)
    np.testing.assert_allclose(float(G0[0]), 0.01, rtol=1e-4)
    # generic timestep: G = sqrt(sigma_i^2 - sigma_{i-1}^2)
    t = jnp.array([0.5])
    ts = int(t[0] * (sde.N - 1))
    sig = np.asarray(sde.discrete_sigmas)
    _, G = sde.discretize(jnp.zeros((1, 3)), t)
    np.testing.assert_allclose(float(G[0]), np.sqrt(sig[ts] ** 2 - sig[ts - 1] ** 2), rtol=1e-4)


def test_forward_marginal_statistics():
    """Perturbing with the closed-form marginal matches empirical statistics."""
    sde = VPSDE(beta_min=0.2, beta_max=1.0, N=1000)
    key = jax.random.PRNGKey(0)
    x0 = jnp.full((20000,), 2.0)
    t = jnp.full((20000,), 0.8)
    mean, std = sde.marginal_prob(x0, t)
    xt = mean + std * jax.random.normal(key, x0.shape)
    assert float(jnp.mean(xt)) == pytest.approx(float(mean[0]), abs=0.02)
    assert float(jnp.std(xt)) == pytest.approx(float(std[0]), abs=0.02)


def test_reverse_discretize_recovers_score_direction():
    sde = VESDE(sigma_min=0.1, sigma_max=10.0, N=100)
    x = jnp.ones((4, 3))
    t = jnp.full((4,), 0.5)
    score = jnp.full((4, 3), 2.0)
    f, G = sde.discretize(x, t)
    rev_f, rev_G = sde.reverse_discretize(x, t, score)
    np.testing.assert_allclose(
        np.asarray(rev_f), np.asarray(f - (G[:, None] ** 2) * score), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(rev_G), np.asarray(G))
    # probability flow halves the score term and zeroes diffusion
    rf_pf, rg_pf = sde.reverse_discretize(x, t, score, probability_flow=True)
    np.testing.assert_allclose(
        np.asarray(rf_pf), np.asarray(f - 0.5 * (G[:, None] ** 2) * score), rtol=1e-6
    )
    assert float(jnp.abs(rg_pf).max()) == 0.0


def test_prior_sampling_sym_is_symmetric_hollow():
    sde = VESDE()
    z = sde.prior_sampling_sym(jax.random.PRNGKey(1), (2, 5, 5))
    np.testing.assert_allclose(np.asarray(z), np.asarray(jnp.swapaxes(z, -1, -2)))
    assert float(jnp.abs(jnp.diagonal(z, axis1=-2, axis2=-1)).max()) == 0.0


def test_prior_logp_standard_normal():
    sde = VPSDE()
    z = jnp.zeros((2, 3, 4))
    lp = sde.prior_logp(z)
    np.testing.assert_allclose(np.asarray(lp), -12 / 2 * np.log(2 * np.pi), rtol=1e-6)


def test_beta_schedules():
    for name in ["quad", "linear", "const", "jsd", "sigmoid"]:
        betas = get_beta_schedule(name, beta_min=0.1, beta_max=1.0, num_diffusion_timesteps=16)
        assert betas.shape == (16,)
        assert np.all(betas > 0)
    with pytest.raises(NotImplementedError):
        get_beta_schedule("nope", beta_min=0.1, beta_max=1.0, num_diffusion_timesteps=4)


def test_make_sde_factory():
    assert isinstance(make_sde("VE", 0.2, 1.0, 1000), VESDE)
    assert isinstance(make_sde("VP", 0.2, 1.0, 1000), VPSDE)
    assert isinstance(make_sde("VE_test", 0.2, 1.0, 10), VESDE)
    ve = make_sde("VE", 0.2, 1.0, 1000)
    assert ve.sigma_min == 0.2 and ve.sigma_max == 1.0


def test_corrector_alpha():
    vp = VPSDE(beta_min=0.1, beta_max=20.0, N=1000)
    ve = VESDE()
    t = jnp.array([0.5])
    assert float(ve.corrector_alpha(t)[0]) == 1.0
    ts = int(0.5 * 999)
    np.testing.assert_allclose(
        float(vp.corrector_alpha(t)[0]), float(vp.alphas[ts]), rtol=1e-6
    )
