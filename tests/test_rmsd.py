import jax
import jax.numpy as jnp
import numpy as np

from moleculesde_tpu.utils.rmsd import coverage_matching, kabsch_align, pairwise_rmsd


def _rot(theta):
    return jnp.array([
        [np.cos(theta), -np.sin(theta), 0.0],
        [np.sin(theta), np.cos(theta), 0.0],
        [0.0, 0.0, 1.0]], dtype=jnp.float32)


def test_kabsch_zero_for_rotated_translated_copy():
    key = jax.random.PRNGKey(0)
    p = jax.random.normal(key, (7, 3))
    q = p @ _rot(1.1).T + jnp.array([3.0, -2.0, 0.5])
    assert float(kabsch_align(p, q)) < 1e-4


def test_kabsch_positive_for_different_structures():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    p = jax.random.normal(k1, (7, 3))
    q = jax.random.normal(k2, (7, 3))
    assert float(kabsch_align(p, q)) > 0.3


def test_kabsch_mask_ignores_padded_atoms():
    key = jax.random.PRNGKey(2)
    p = jax.random.normal(key, (6, 3))
    q = p @ _rot(0.3).T
    mask = jnp.array([True] * 4 + [False] * 2)
    q_dirty = q.at[4:].set(100.0)
    assert float(kabsch_align(p, q_dirty, mask)) < 1e-4


def test_coverage_matching():
    key = jax.random.PRNGKey(3)
    ref = jax.random.normal(key, (3, 5, 3))
    gen = jnp.concatenate([ref[:2] @ _rot(0.5).T,
                           jax.random.normal(jax.random.PRNGKey(4), (2, 5, 3)) * 5])
    cov, mat = coverage_matching(np.asarray(gen), np.asarray(ref), threshold=0.1)
    # the first two refs are covered exactly; the third is not
    assert abs(cov - 2 / 3) < 1e-6
    assert mat > 0
    d = pairwise_rmsd(gen, ref)
    assert d.shape == (4, 3)
