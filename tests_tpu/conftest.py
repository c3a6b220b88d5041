"""TPU compiled-kernel test lane (VERDICT r1 weak #5).

The main suite (tests/) forces the CPU platform and runs the Pallas kernel
in interpret mode only; this lane pins the REAL Mosaic codegen path. Run it
on a machine with a TPU attached:

    python -m pytest tests_tpu/ -q

Every test here skips automatically when no TPU device is available, so the
lane is safe to include in any CI invocation. Do not run it concurrently
with another TPU process (single-chip tunnel).
"""

import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent.parent / "tests" / "data"


def _tpu_available() -> bool:
    try:
        import jax

        return any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if _tpu_available():
        return
    skip = pytest.mark.skip(reason="no TPU device available")
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def corpus_bytes() -> bytes:
    return (DATA_DIR / "taylorswift.txt").read_bytes()


@pytest.fixture(scope="session")
def golden_merges():
    from zigbpe_tpu.utils import serde

    return serde.load(DATA_DIR / "merges.txt")
