"""Importing the package must not initialize a JAX backend.

On axon-pinned machines the JAX_PLATFORMS env var is ignored, so CLIs
force platforms via jax.config.update("jax_platforms", ...) AFTER arg
parsing (CLAUDE.md). That only works while no backend exists yet: a
single module-level device constant (e.g. `jnp.float32(-inf)`) pins the
default backend at import time, silently turning every later
`--platform cpu` into a no-op — embed-all's "cpu" test subprocesses were
really compiling tiny encoders through the TPU relay (and flaking
whenever the relay was unhappy). Runs in a clean subprocess because the
test process itself has long since initialized its CPU backend.
"""

import subprocess
import sys

CHECK = """
from jax._src import xla_bridge
import knn_for_homology_tpu.pipelines
import knn_for_homology_tpu.parallel
import knn_for_homology_tpu.models
import knn_for_homology_tpu.interop
import knn_for_homology_tpu.search
import knn_for_homology_tpu.eval
assert not xla_bridge._backends, (
    "package import initialized a JAX backend: %s"
    % list(xla_bridge._backends)
)
import jax
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
print("OK")
"""


def test_package_import_does_not_initialize_backend():
    out = subprocess.run(
        [sys.executable, "-c", CHECK],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
