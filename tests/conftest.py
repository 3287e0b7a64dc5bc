"""Test environment: force JAX onto a virtual 8-device CPU platform so the
multi-chip sharding paths (jax.sharding.Mesh) are exercised without TPUs
(SURVEY.md §4 'Implication for the rebuild')."""

import os

# Must happen before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import pathlib
import sys

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_ROOT = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def reference():
    """Import reference modules for parity testing (public untrusted content;
    we only execute the specific numeric functions under test, never its CLI
    paths). Native deps absent in this environment (torchaudio, pyworld) are
    stubbed out — the functions under parity test don't touch them."""
    import types

    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not mounted")

    # stub torchaudio and pyworld (imported at module scope by the reference)
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
