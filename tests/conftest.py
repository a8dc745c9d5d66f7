"""Test config: force JAX onto a virtual 8-device CPU mesh.

The build machine has one real TPU chip; multi-chip sharding logic is
validated on CPU with ``xla_force_host_platform_device_count=8`` (SURVEY.md
§4's multi-host testing note). The axon sitecustomize pre-registers the TPU
backend, so the platform must be overridden via jax.config *after* import.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ.setdefault("SVT_TEST_MODE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"
TEST_CHMMS = os.path.join(REFERENCE_ROOT, "chmm_files", "test_chmms")
TEST_SEQS = os.path.join(REFERENCE_ROOT, "ess_files", "test_sequences")
CHMM_DIR = os.path.join(REFERENCE_ROOT, "chmm_files")
ESS_DIR = os.path.join(REFERENCE_ROOT, "ess_files")


@pytest.fixture(scope="session")
def fixture_paths():
    return [
        (
            os.path.join(TEST_CHMMS, f"{i}_test_chmm.chmm"),
            os.path.join(TEST_SEQS, f"{i}_test_seq.ess"),
        )
        for i in range(4)
    ]
