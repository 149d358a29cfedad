import os

# Hermetic CPU tests with a virtual 8-device mesh (SURVEY.md §4). The axon
# TPU plugin ignores the JAX_PLATFORMS env var, so force the platform via
# jax.config before any backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# CGE_TPU_TESTS=1 leaves the real backend in place so the TPU-only suites
# (tests/test_tpu_parity.py, the tpu256 goldens) can run on a chip.
if os.environ.get("CGE_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's dominant cost on the
# 1-core bench host is recompiling the same step/render programs every
# run (VERDICT r4 weak #8). Cache entries key on the HLO, so code changes
# invalidate themselves; delete .cache/xla to force a cold run.
_xla_cache = os.path.join(os.path.dirname(__file__), "..", ".cache", "xla")
os.makedirs(_xla_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _xla_cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


REF_MAPS = "/root/reference/assets/game/map"


@pytest.fixture(scope="session")
def test_map():
    from c_game_engine_tpu.compiler.cache import load_compiled

    cm, _ = load_compiled(f"{REF_MAPS}/test.gmap", with_bundle=False)
    return cm


@pytest.fixture(scope="session")
def rig():
    """Synthetic kitchen-sink map shared by the behavior tests (single
    compile per session)."""
    from tests.worldgen import build_rig

    return build_rig()
