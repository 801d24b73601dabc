"""Driver-contract regression tests for __graft_entry__.py.

Round-1 verdict item #1: dryrun_multichip crashed under the driver because
it relied on the caller's environment to select the CPU platform — this
machine pins JAX_PLATFORMS=axon and ignores the env var. The function must
force the platform itself via jax.config. These tests run it the way the
driver does: a fresh subprocess with only XLA_FLAGS set.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _run_in_driver_env(code: str, extra_env: dict | None = None):
    """Fresh interpreter, XLA_FLAGS for 8 virtual devices, NO JAX_PLATFORMS
    override — mirrors the driver's invocation."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    if extra_env:
        env.update(extra_env)
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )


def test_dryrun_multichip_forces_cpu_platform():
    proc = _run_in_driver_env(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]


def test_dryrun_multichip_odd_device_count():
    # model_par falls back to 1; exercises the non-divisible branch.
    proc = _run_in_driver_env(
        "import __graft_entry__; __graft_entry__.dryrun_multichip(5)"
    )
    assert proc.returncode == 0, proc.stderr[-4000:]


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    sims, ids = jax.jit(fn)(*args)
    assert ids.shape == (16, 13)
    jax.block_until_ready((sims, ids))
