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

# The axon TPU plugin pins jax_platforms="axon,cpu", so the JAX_PLATFORMS=cpu
# above does NOT keep computations off the (tunneled, single) TPU — and the
# tunnel can be flaky (a hung client poisons it for ~10-20 min; see
# docs/STATUS.md round 3).  The suite therefore DEFAULTS to CPU-forced
# (jax.default_device on a virtual CPU — this conftest's original intent;
# ~5 min, zero tunnel traffic); the Mosaic-path tests (test_pallas_hw, the
# TPU-mesh and long-n tests) detect the mode and skip.  Run those on the
# real chip with RNA_ALGOS_TEST_CPU=0, one file at a time under
# `timeout -s KILL` (see CLAUDE.md "Testing").
_FORCE_CPU = os.environ.get("RNA_ALGOS_TEST_CPU", "1") == "1"
if _FORCE_CPU:
    os.environ.setdefault("RNA_ALGOS_BACKEND", "xla")
    # interpret-mode stacked-kernel tests are G-generic (outputs are
    # exactly G-invariant, pinned by the hardware run at the production
    # default); G=8 keeps the CPU interpreter batches small
    os.environ.setdefault("RNA_ALGOS_G", "8")


@pytest.fixture(scope="session", autouse=True)
def _default_device_cpu():
    if not _FORCE_CPU:
        yield
        return
    import jax

    with jax.default_device(jax.devices("cpu")[0]):
        yield


def tpu_required_skip():
    """Shared skip condition for tests that must run Mosaic on hardware."""
    import jax

    if _FORCE_CPU:
        return "RNA_ALGOS_TEST_CPU=1 (CPU-forced run)"
    if jax.default_backend() in ("cpu",):
        return "Mosaic path needs a TPU"
    return None


@pytest.fixture(scope="session")
def trna_records():
    from rna_algos_tpu.utils import read_fasta

    return read_fasta(REPO_ROOT / "assets" / "sampled_trnas.fa")
