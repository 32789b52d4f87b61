"""Test configuration: force a virtual 8-device CPU platform.

Per-project policy, tests never require TPU hardware: the multi-chip sharding
path is validated on a virtual CPU mesh (the driver's dryrun does the same).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads timeshare the physical cores: raise the CPU
# collective rendezvous limits BEFORE backend init or heavy sharded tests
# (flagship dryrun) abort the whole pytest process after 40 s of skew
for _f in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600",
    "--xla_cpu_collective_call_terminate_timeout_seconds=1200",
):
    if _f.split("=")[0] not in _flags:
        _flags += " " + _f
os.environ["XLA_FLAGS"] = _flags.strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the config
# update below is what actually pins the test platform to (8 virtual) CPUs.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FEMUR_DIR = "/root/reference/data/femur"


@pytest.fixture(scope="session")
def femur_model50():
    from icp_proposal_tpu.io.statismo import read_statismo_gpmm

    return read_statismo_gpmm(os.path.join(FEMUR_DIR, "femur_gp_model_50-components.h5"))


@pytest.fixture(scope="session")
def femur_target_mesh():
    from icp_proposal_tpu.apps.femur import load_femur_data

    data = load_femur_data(model_components=50)
    return data.target


@pytest.fixture(scope="session")
def femur_data():
    from icp_proposal_tpu.apps.femur import load_femur_data

    return load_femur_data(model_components=50)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
