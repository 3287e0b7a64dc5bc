"""Test environment: force JAX onto a virtual 8-device CPU platform so the
multi-chip sharding paths (jax.sharding.Mesh) are exercised without TPUs
(SURVEY.md §4 'Implication for the rebuild').

This box routes JAX to a real TPU chip through the `axon` PJRT plugin, which
is registered by a sitecustomize at *interpreter start* (before conftest runs)
and overrides the JAX_PLATFORMS env var. The reliable override is
jax.config.update("jax_platforms", "cpu") before the first backend use —
env-var games are too late, and re-exec'ing pytest loses its captured fds."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO_ROOT))


# Tier split (see pytest.ini): these modules hold the torch-parity and
# heavy-compile tests. Everything else is the fast wiring tier
# (`pytest -m "not slow"`), kept under ~2 min so a green run fits in a
# driver window.
SLOW_MODULES = {
    "test_wavlm",
    "test_hifigan",
    "test_ops",
    "test_dsp",
    "test_training",
    "test_train_loop",
    "test_pipeline_parity",
    "test_pool_seam",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.rsplit(".", 1)[-1] in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    import jax

    assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def reference():
    """Import reference modules for parity testing (public untrusted content;
    we only execute the specific numeric functions under test, never its CLI
    paths). Native deps absent in this environment (torchaudio, pyworld) are
    stubbed out — the functions under parity test don't touch them."""
    import types

    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")

    for name in ("torchaudio", "torchaudio.transforms", "torchaudio.functional", "pyworld"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]

    if str(REFERENCE_ROOT) not in sys.path:
        sys.path.insert(0, str(REFERENCE_ROOT))

    ns = types.SimpleNamespace()
    import importlib

    ns.lib_ongaku = importlib.import_module("lib_ongaku_test")
    ns.wavlm_mod = importlib.import_module("wavlm.WavLM")
    ns.wavlm_modules = importlib.import_module("wavlm.modules")
    ns.hifigan_models = importlib.import_module("hifigan.ddsp_models")
    ns.hifigan_models_f0 = importlib.import_module("hifigan.ddsp_models_f0")
    ns.hifigan_utils = importlib.import_module("hifigan.utils")
    ns.prematch = importlib.import_module("ddsp_prematch_dataset")
    return ns


@pytest.fixture(scope="session")
def sample_content():
    d = REFERENCE_ROOT / "sample_content"
    if not d.exists():
        pytest.skip("sample_content not available")
    return d
