"""Test configuration: run the suite on a simulated 8-device CPU mesh.

This is the TPU-native analogue of a fake distributed backend — pjit/sharding
paths are exercised on ``--xla_force_host_platform_device_count=8`` virtual
CPU devices, so the full multi-chip code compiles and runs without TPU
hardware (see SURVEY.md section 4).

Environment detail: this image's ``sitecustomize`` registers a remote-TPU
(axon) PJRT plugin in every Python process and pins ``JAX_PLATFORMS=axon``,
which both claims the TPU (slow) and would run unit tests on one remote chip.
We re-exec pytest once with the plugin disabled so tests get a fast local
8-device CPU backend.
"""

import os
import sys

if os.environ.get("MOLSDE_TEST_REEXEC") != "1":
    env = dict(os.environ)
    env["MOLSDE_TEST_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip remote-TPU plugin registration
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)
