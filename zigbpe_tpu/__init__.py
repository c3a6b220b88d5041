"""zigbpe-tpu: a TPU-native byte-level BPE tokenizer framework.

Capability parity with dbtreasure/zig-bpe (train / encode / decode /
merges.txt serde / profiling), re-designed TPU-first: dense scatter-add
pair histograms, on-device argmax with deterministic tie-break, vectorized
leftmost-greedy merge passes, fixed-shape compaction, and data-parallel
training over a jax.sharding.Mesh with psum-reduced counts.
"""

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
