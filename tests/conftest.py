"""Test harness: force an 8-device virtual CPU mesh before JAX is imported.

The reference had no distributed tests (SURVEY.md §4); here every sharded
path is exercised against the single-device result on a virtual mesh, so
multi-chip semantics are CI-tested without TPU hardware.
"""

import json
import os
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

# Some environments pin JAX_PLATFORMS via a site hook before we run; the
# config update wins over that and keeps tests on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

REFERENCE_TEST_DATA = Path("/root/reference/test-data")


@pytest.fixture(scope="session")
def reference_data_dir():
    if not REFERENCE_TEST_DATA.is_dir():
        pytest.skip("reference test-data not available")
    return REFERENCE_TEST_DATA


@pytest.fixture()
def synthetic_dataset(tmp_path):
    """A deterministic clustered dataset in the standard directory layout:
    8 families × (6 train + 3 test), d=32, well-separated centroids."""
    rng = np.random.RandomState(1234)
    n_fam, n_train, n_test, d = 8, 6, 3, 32
    centroids = rng.randn(n_fam, d) * 10.0
    train, test, train_ids, test_ids, fam_map = [], [], [], [], {}
    for f in range(n_fam):
        for j in range(n_train):
            train.append(centroids[f] + rng.randn(d))
            name = f"fam{f}_train{j}"
            train_ids.append(name)
            fam_map[name] = f"F{f}"
        for j in range(n_test):
            test.append(centroids[f] + rng.randn(d))
            name = f"fam{f}_test{j}"
            test_ids.append(name)
            fam_map[name] = f"F{f}"
    np.save(tmp_path / "train.npy", np.asarray(train, dtype=np.float32))
    np.save(tmp_path / "test.npy", np.asarray(test, dtype=np.float32))
    (tmp_path / "train.json").write_text(json.dumps(train_ids))
    (tmp_path / "test.json").write_text(json.dumps(test_ids))
    (tmp_path / "ids_to_family.json").write_text(json.dumps(fam_map))
    aas = "ACDEFGHIKLMNPQRSTVWY"
    with open(tmp_path / "train.fasta", "w") as fp:
        for name in train_ids:
            seq = "".join(rng.choice(list(aas), size=50))
            fp.write(f">{name}\n{seq}\n")
    with open(tmp_path / "test.fasta", "w") as fp:
        for name in test_ids:
            seq = "".join(rng.choice(list(aas), size=50))
            fp.write(f">{name}\n{seq}\n")
    return tmp_path
