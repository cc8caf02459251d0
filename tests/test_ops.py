import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moleculesde_tpu.ops import (
    cosine_cutoff,
    gaussian_fourier_projection,
    gaussian_rbf,
    gaussian_smearing,
    shifted_softplus,
)
from moleculesde_tpu.ops.rejected.frames_edgelist import (
    coord2basis,
    frame_features,
    perturb_distance,
)


def _random_rotation(key):
    # build in float64 numpy for an exactly-orthogonal proper rotation
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    q, r = np.linalg.qr(rng.normal(size=(3, 3)))
    q = q * np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return jnp.asarray(q, dtype=jnp.float32)


def test_coord2basis_rotation_equivariance():
    key = jax.random.PRNGKey(0)
    pos = jax.random.normal(key, (6, 3))
    row = jnp.array([0, 1, 2, 3])
    col = jnp.array([1, 2, 3, 4])
    R = _random_rotation(jax.random.PRNGKey(7))
    b1 = coord2basis(pos, row, col)
    b2 = coord2basis(pos @ R.T, row, col)
    for v1, v2 in zip(b1, b2):
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1 @ R.T), atol=1e-4)


def test_frame_features_rotation_invariant_coefficients():
    key = jax.random.PRNGKey(1)
    pos = jax.random.normal(key, (5, 3))
    row = jnp.array([0, 2, 4])
    col = jnp.array([1, 3, 0])
    R = _random_rotation(jax.random.PRNGKey(3))
    _, ci1, cj1, ang1 = frame_features(pos, row, col)
    _, ci2, cj2, ang2 = frame_features(pos @ R.T, row, col)
    np.testing.assert_allclose(np.asarray(ci1), np.asarray(ci2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(cj1), np.asarray(cj2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ang1), np.asarray(ang2), atol=1e-4)


def test_frame_features_reflection_antisymmetry():
    """Under reflection the cross-basis coefficient would flip sign; the |.|
    makes the scalar features invariant while coord_cross flips (the source of
    reflection anti-symmetry in the generated scores)."""
    key = jax.random.PRNGKey(2)
    pos = jax.random.normal(key, (4, 3))
    row = jnp.array([0, 2])
    col = jnp.array([1, 3])
    F = jnp.diag(jnp.array([1.0, 1.0, -1.0]))  # mirror in z
    basis1, ci1, cj1, ang1 = frame_features(pos, row, col)
    basis2, ci2, cj2, ang2 = frame_features(pos @ F, row, col)
    # invariant scalar features unchanged
    np.testing.assert_allclose(np.asarray(ci1), np.asarray(ci2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ang1), np.asarray(ang2), atol=1e-4)
    # cross vector flips (anti-symmetric): F(a x b) = -(Fa x Fb) for reflections
    np.testing.assert_allclose(
        np.asarray(basis2[1]), -np.asarray(basis1[1] @ F), atol=1e-4
    )


def test_frames_no_nan_on_padded_zero_positions():
    pos = jnp.zeros((4, 3))
    row = jnp.array([0, 1])
    col = jnp.array([2, 3])

    def loss(p):
        basis, ci, cj, ang = frame_features(p, row, col)
        return sum(jnp.sum(b) for b in basis) + jnp.sum(ci) + jnp.sum(cj) + jnp.sum(ang)

    val, grad = jax.value_and_grad(loss)(pos)
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_perturb_distance_grad_finite_at_zero():
    pos = jnp.zeros((2, 3))
    g = jax.grad(lambda p: jnp.sum(perturb_distance(p, jnp.array([0]), jnp.array([1]))))(pos)
    assert np.all(np.isfinite(np.asarray(g)))


def test_gaussian_fourier_projection():
    w = jnp.array([1.0, 2.0])
    x = jnp.array([[0.5]])
    out = gaussian_fourier_projection(x, w)
    assert out.shape == (1, 4)
    np.testing.assert_allclose(
        np.asarray(out[0]),
        [np.sin(np.pi), np.sin(2 * np.pi), np.cos(np.pi), np.cos(2 * np.pi)],
        atol=1e-5,
    )


def test_gaussian_smearing_peaks():
    d = jnp.array([0.0, 5.0])
    out = gaussian_smearing(d, 0.0, 10.0, 51)
    assert out.shape == (2, 51)
    assert int(jnp.argmax(out[0])) == 0
    assert int(jnp.argmax(out[1])) == 25  # 5.0 hits the middle basis


def test_rbf_and_cutoff():
    out = gaussian_rbf(jnp.array([0.0, 2.5]), n_rbf=20, cutoff=5.0)
    assert out.shape == (2, 20)
    c = cosine_cutoff(jnp.array([0.0, 2.5, 5.0, 6.0]), 5.0)
    np.testing.assert_allclose(np.asarray(c), [1.0, 0.5, 0.0, 0.0], atol=1e-6)


def test_shifted_softplus():
    np.testing.assert_allclose(float(shifted_softplus(jnp.array(0.0))), 0.0, atol=1e-6)


def test_gaussian_fourier_projection_custom_vjp():
    """The custom VJP (backward from saved sin/cos, ops/fourier.py) must
    match the autodiff of the naive formula for both x and w cotangents."""
    import math

    w = jnp.array([0.3, 1.7, 2.2])
    x = jnp.array([[0.5], [-1.2], [0.0], [3.4]])

    def naive(x, w):
        proj = x * w * 2.0 * math.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    out = gaussian_fourier_projection(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive(x, w)),
                               atol=1e-6)

    cot = jax.random.normal(jax.random.PRNGKey(0), out.shape)
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(gaussian_fourier_projection(x, w) * cot),
        argnums=(0, 1))(x, w)
    gx_ref, gw_ref = jax.grad(
        lambda x, w: jnp.sum(naive(x, w) * cot), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref), atol=1e-5)
