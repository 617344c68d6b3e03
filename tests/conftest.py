"""Test bootstrap: force an 8-device virtual CPU mesh.

The sandbox boots every interpreter with a TPU (`axon`) backend registered via
sitecustomize before conftest runs, so we switch platforms in-process: update
jax_platforms to cpu and clear the backend cache so the CPU client is created
fresh with --xla_force_host_platform_device_count=8. This mirrors the survey's
multi-device test plan (SURVEY.md §4).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge  # noqa: E402

if hasattr(xla_bridge, "_clear_backends"):
    xla_bridge._clear_backends()
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from paddlemix_tpu.parallel.mesh import MeshConfig, create_mesh

    return create_mesh(MeshConfig(data_parallel_degree=2, fsdp_parallel_degree=2,
                                  tensor_parallel_degree=2, sequence_parallel_degree=1))
