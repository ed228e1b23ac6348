"""Test configuration: force CPU JAX with an 8-device virtual mesh.

Must run before the first ``import jax`` anywhere (SURVEY.md §4: CPU-only CI
via jax[cpu] + virtual devices; the driver separately dry-runs multi-chip).
"""

import os
import sys

import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# tests must not share AOT artifacts with other hosts/backends (SIGILL risk)
os.environ["FOCR_TPU_NO_COMPILE_CACHE"] = "1"
# isolate the template-bank disk cache per test session (still exercised)
os.environ["FOCR_TPU_CACHE_DIR"] = tempfile.mkdtemp(prefix="focr_banks_")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment's sitecustomize force-registers the axon TPU backend and
# sets jax_platforms="axon,cpu" via jax.config, overriding the env var — so
# re-override it here, before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

DEJAVU_MONO = "/usr/share/fonts/truetype/dejavu/DejaVuSansMono.ttf"
DEJAVU_SANS = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"


@pytest.fixture(scope="session")
def mono_font_path() -> str:
    return DEJAVU_MONO


@pytest.fixture(scope="session")
def sans_font_path() -> str:
    return DEJAVU_SANS
