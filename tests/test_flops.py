"""Analytic matmul-FLOP counter (utils/flops.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from moleculesde_tpu.utils.flops import matmul_flops


def test_plain_matmul():
    a = jnp.zeros((8, 16))
    b = jnp.zeros((16, 32))
    assert matmul_flops(lambda a, b: a @ b, a, b) == 2 * 8 * 16 * 32


def test_batched_einsum():
    a = jnp.zeros((4, 8, 16))
    b = jnp.zeros((4, 16, 32))
    f = lambda a, b: jnp.einsum("bmk,bkn->bmn", a, b)
    assert matmul_flops(f, a, b) == 2 * 4 * 8 * 16 * 32


def test_grad_counts_forward_and_backward():
    a = jnp.zeros((8, 16))
    w = jnp.zeros((16, 4))
    fwd = matmul_flops(lambda w: jnp.sum(a @ w), w)
    tot = matmul_flops(jax.grad(lambda w: jnp.sum(a @ w)), w)
    # backward of one matmul adds one matmul of the same size (dW = a^T g;
    # dx not needed since a is a constant captured by closure... it may
    # still be staged; accept fwd+bwd in [2x, 3x])
    assert fwd == 2 * 8 * 16 * 4
    assert 2 * fwd <= tot <= 3 * fwd


def test_jit_and_scan_recursion():
    w = jnp.zeros((16, 16))

    @jax.jit
    def f(w):
        def body(x, _):
            return x @ w, None
        x, _ = jax.lax.scan(body, jnp.zeros((8, 16)), None, length=5)
        return x
    assert matmul_flops(f, w) == 5 * 2 * 8 * 16 * 16


def test_remat_recompute_counted():
    a = jnp.zeros((8, 16))

    @jax.checkpoint
    def block(w):
        return jnp.tanh(a @ w)

    w = jnp.zeros((16, 16))
    g = matmul_flops(jax.grad(lambda w: jnp.sum(block(w))), w)
    plain = matmul_flops(jax.grad(lambda w: jnp.sum(jnp.tanh(a @ w))), w)
    # remat re-runs the forward matmul inside the backward
    assert g >= plain
