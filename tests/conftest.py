"""Test bootstrap: run the suite on a virtual 8-device CPU mesh.

The ambient environment registers a tunneled-TPU PJRT plugin in every Python
process (sitecustomize on PYTHONPATH) and pins JAX_PLATFORMS to it; merely
importing jax then blocks for minutes while the plugin claims the remote
chip. Unit tests must run on CPU, so if we detect that environment (and jax
has not been imported yet) we re-exec the interpreter once with a cleaned
environment: no sitecustomize, JAX_PLATFORMS=cpu, and 8 virtual CPU devices
for sharding tests.
"""

import os
import sys

_MARK = "_TPU_OD_TESTS_REEXECED"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    return "axon" in os.environ.get("PYTHONPATH", "") or os.environ.get(
        "JAX_PLATFORMS", ""
    ) not in ("", "cpu")


if _needs_reexec():
    import subprocess

    env = dict(os.environ)
    env[_MARK] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    # subprocess (not execve): pytest's output capture machinery loses the
    # terminal across an exec, swallowing the report entirely.
    ret = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env
    ).returncode
    os._exit(ret)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
