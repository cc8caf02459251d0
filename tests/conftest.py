"""Test configuration: run the suite on a simulated 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend — pjit/sharding
paths are exercised on ``--xla_force_host_platform_device_count=8`` virtual
CPU devices, so the full multi-chip code compiles and runs without TPU
hardware (see SURVEY.md section 4).

Environment detail: this image's ``sitecustomize`` registers a remote-TPU
(axon) PJRT plugin in every Python process and pins ``JAX_PLATFORMS=axon``.
We switch the already-initialized process to a fresh 8-device CPU backend
in place (clearing the backend cache) so unit tests are fast, deterministic,
and don't occupy the TPU.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:  # pragma: no cover - jax-internal API drift
    pass
assert jax.devices()[0].platform == "cpu", "CPU test backend unavailable"


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running test")
