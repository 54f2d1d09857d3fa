"""Test configuration.

Notes on the environment:

- Some installed packages register pytest plugins that import jax before
  this conftest runs, so JAX_PLATFORMS set here cannot reliably switch the
  backend — tests run on whatever backend the host provides (TPU in CI,
  CPU elsewhere).  Tests must therefore be backend-agnostic.
- On TPU, the default matmul/conv precision is bfloat16; the OpenCV-parity
  suites need float32 math, so we force 'highest' precision globally.
- Multi-device mesh tests need 8 virtual CPU devices
  (``xla_force_host_platform_device_count``); since the in-process backend
  may already be initialised, those tests run in a clean subprocess — see
  ``run_in_cpu_subprocess``.
"""

import os
import pathlib
import subprocess
import sys
import textwrap

# best effort for environments where jax is not yet imported
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax  # noqa: E402

if os.environ.get("NSOF_TEST_CPU"):
    # Fast-tier escape hatch: force the CPU backend even when a remote-TPU
    # site hook rewrites JAX_PLATFORMS.  jax.config wins as long as no
    # backend has been initialised yet (plugins import jax but don't
    # create devices at import time).  Pallas-kernel tests guarded by
    # ON_TPU skip themselves under this mode.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")

# Persist XLA compiles — over the remote-TPU tunnel a single stage compile
# costs 20-240 s and dominates the suite's wall time; the cache makes
# repeat runs compile-free.  (Harmless on CPU.)
jax.config.update(
    "jax_compilation_cache_dir",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/data")
REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent


def reference_data_available() -> bool:
    return REFERENCE_DATA.is_dir()


requires_reference_data = pytest.mark.skipif(
    not reference_data_available(),
    reason="bundled reference datasets not mounted",
)


def run_in_cpu_subprocess(code: str, n_devices: int = 8, timeout: int = 600):
    """Run a python snippet under a clean 8-virtual-device CPU backend.

    Returns the completed process; asserts exit code 0 with stderr shown.
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["PYTHONPATH"] = f"{REPO_ROOT}:{env.get('PYTHONPATH', '')}"
    # the TPU-tunnel site hook rewrites JAX_PLATFORMS to prefer its
    # backend; forcing via jax.config before first device use wins
    preamble = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", preamble + textwrap.dedent(code)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"subprocess failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    return proc


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
