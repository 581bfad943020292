"""Test environment: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh (the driver separately
dry-runs the multi-chip path via __graft_entry__.dryrun_multichip); single-chip
numerics are identical between CPU and TPU at float32 for this workload.
Must run before jax is imported anywhere.
"""

import os

# Persistent compilation cache: the axon TPU tunnel recompiles per process
# otherwise, dominating test wall time.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

import pytest


@pytest.fixture(scope="session")
def trna_records():
    from rna_algos_tpu.utils import read_fasta

    return read_fasta(REPO_ROOT / "assets" / "sampled_trnas.fa")
