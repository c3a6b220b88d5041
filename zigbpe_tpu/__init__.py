"""zigbpe-tpu: a TPU-native byte-level BPE tokenizer framework.

Capability parity with dbtreasure/zig-bpe (train / encode / decode /
merges.txt serde / profiling), re-designed TPU-first: dense scatter-add
pair histograms, on-device argmax with deterministic tie-break, vectorized
leftmost-greedy merge passes, fixed-shape compaction, and data-parallel
training over a jax.sharding.Mesh with psum-reduced counts.
"""

import os as _os


def _configure_compile_cache() -> None:
    """Point JAX at a persistent compilation cache (the reference compiles
    once, build.zig:3-34; the shrink schedule here compiles one executable
    per power-of-two capacity, and on a remote-compile TPU backend a cold
    cascade costs tens of seconds — cache it across processes instead).

    Opt out with ZIGBPE_NO_COMPILE_CACHE=1; relocate with
    ZIGBPE_COMPILE_CACHE=<dir>.
    """
    if _os.environ.get("ZIGBPE_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache = _os.environ.get("ZIGBPE_COMPILE_CACHE")
        if cache is None:
            # respect a cache dir the host application configured before
            # importing this package; only install the default when unset
            if jax.config.jax_compilation_cache_dir is not None:
                return
            cache = _os.path.join(
                _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
                "zigbpe_jax",
            )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # never block import on cache plumbing


_configure_compile_cache()

from .models.basic_tokenizer import BasicTokenizer, InvalidTokenError
from .models import oracle
from .utils import serde
from .utils.profiling import TimeStats

__version__ = "0.1.0"

__all__ = [
    "BasicTokenizer",
    "InvalidTokenError",
    "oracle",
    "serde",
    "TimeStats",
    "__version__",
]
