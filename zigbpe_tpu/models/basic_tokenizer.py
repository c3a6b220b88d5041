"""BasicTokenizer — the framework's flagship model.

Capability parity with the reference ``BasicTokenizer`` struct
(reference: /root/reference/src/basic_tokenizer.zig:52-349): train / encode
/ decode / serialize / deserialize, plus TimeStats-style profiling. The
merge list is the entire model; **order is the model** (SURVEY.md §2,
component 3).

Differences from the reference, by design (SURVEY.md §2.3.9 quirks not
replicated):

* ``train`` and ``load_merges`` replace the model instead of appending to
  any pre-existing merge list.
* Empty/1-byte corpora train zero merges instead of underflowing.
* Decode is iterative with cycle detection instead of unbounded recursion.
"""

from __future__ import annotations

import functools
import os
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..utils import serde
from ..utils.profiling import TimeStats
from . import oracle

Merge = Tuple[int, int, int]

VOCAB_START = 256

# Inputs below this size encode faster on the host than a device dispatch.
_DEVICE_ENCODE_THRESHOLD = 1 << 16


class InvalidTokenError(ValueError):
    pass


def _encode_capacity(n: int) -> int:
    cap = 256
    while cap < n:
        cap *= 2
    return cap


@functools.lru_cache(maxsize=None)
def _encode_jit(use_pallas: bool = False):
    import jax

    from ..ops import core

    return jax.jit(functools.partial(core.encode_replay, use_pallas=use_pallas))


@functools.lru_cache(maxsize=None)
def _encode_batch_jit():
    # XLA fallback path only; the Pallas path goes through the cached
    # grouped table + encode_rows_grouped in encode_batch (re-grouping the
    # table per call would be silent trace-time overhead).
    import jax

    from ..ops import encode_batch as eb

    return jax.jit(eb.encode_batch)


class BasicTokenizer:
    """Host-facing tokenizer model backed by the TPU device path."""

    def __init__(self, merges: Optional[Iterable[Sequence[int]]] = None):
        self.merges: List[Merge] = [tuple(int(v) for v in m) for m in merges or []]
        self.time_stats = TimeStats()
        self._device_merges = None  # cached (M,3) device array
        self._grouped_merges = None  # cached (gtable, glens) device arrays

    # ------------------------------------------------------------------ train

    def train(
        self,
        text: bytes | str,
        vocab_size: int,
        verbose: bool = False,
        backend: str = "auto",
        **kwargs,
    ) -> "BasicTokenizer":
        """Train the merge table (reference basic_tokenizer.zig:140-205).

        backend: 'device' (jitted JAX hot loop), 'host' (pure-Python
        oracle), or 'auto'.
        """
        if isinstance(text, str):
            text = text.encode("utf-8")
        if backend == "auto":
            backend = "device"
        if backend == "device":
            from .. import train as train_mod

            self.merges = train_mod.train(
                text, vocab_size, verbose=verbose, stats=self.time_stats, **kwargs
            )
        elif backend == "host":
            from . import numpy_backend

            self.merges = numpy_backend.train(text, vocab_size, verbose=verbose)
        elif backend == "oracle":
            self.merges = oracle.train(text, vocab_size, verbose=verbose)
        else:
            raise ValueError(f"unknown backend {backend!r}")
        self._device_merges = None
        self._grouped_merges = None
        return self

    # ----------------------------------------------------------------- encode

    def encode(self, text: bytes | str, backend: str = "auto") -> List[int]:
        """Encode text by replaying merges in training order
        (reference basic_tokenizer.zig:71-88)."""
        if isinstance(text, str):
            text = text.encode("utf-8")
        if backend == "auto":
            backend = "device" if len(text) >= _DEVICE_ENCODE_THRESHOLD else "host"
        if backend == "host":
            from . import numpy_backend

            return numpy_backend.encode(text, self.merges)
        if backend == "oracle":
            return oracle.encode(text, self.merges)
        if backend != "device":
            raise ValueError(f"unknown backend {backend!r}")
        if not self.merges:
            return list(text)

        import jax.numpy as jnp

        from ..ops import core

        if self._device_merges is None:
            self._device_merges = jnp.asarray(np.asarray(self.merges, dtype=np.int32))
        from ..ops import pallas as pallas_pkg

        capacity = _encode_capacity(max(len(text), 1))
        tokens, _ = core.pad_tokens(text, capacity)
        out, length = _encode_jit(pallas_pkg.merge_kernel_supported(capacity))(
            tokens, self._device_merges
        )
        return np.asarray(out)[: int(length)].tolist()

    def encode_batch(self, docs, row_length: Optional[int] = None) -> List[List[int]]:
        """Encode a batch of documents as padded rows on device — the
        serving-path API (BASELINE.json config 3). Each row is independent;
        semantics per row are identical to :meth:`encode`."""
        if not docs:
            return []
        docs = [d.encode("utf-8") if isinstance(d, str) else bytes(d) for d in docs]
        if not self.merges:
            return [list(d) for d in docs]

        import jax.numpy as jnp

        from ..ops import encode_batch as eb

        if self._device_merges is None:
            self._device_merges = jnp.asarray(np.asarray(self.merges, dtype=np.int32))
        from ..ops import pallas as pallas_pkg

        if row_length:
            L = row_length
        else:
            # Tight power-of-two capacity; the Pallas encode kernel needs
            # >= 8 rows (1024 lanes), so the floor applies only when the
            # kernel will actually run — the XLA fallback keeps the tight
            # capacity instead of padding short-doc batches up to 16x.
            L = _encode_capacity(max((len(d) for d in docs), default=1))
            if pallas_pkg.encode_kernel_supported(max(L, 1024)):
                L = max(L, 1024)
        tokens, _ = eb.pad_batch(docs, L)
        if pallas_pkg.encode_kernel_supported(L):
            from ..ops.pallas import encode as pe

            if self._grouped_merges is None:
                gt, gl = pe.schedule_merges(
                    np.asarray(self.merges, np.int32), cap=32
                )
                self._grouped_merges = (jnp.asarray(gt), jnp.asarray(gl))
            out, lengths = pe.encode_rows_grouped(tokens, *self._grouped_merges)
        else:
            out, lengths = _encode_batch_jit()(tokens, self._device_merges)
        out = np.asarray(out)
        lengths = np.asarray(lengths)
        return [out[i, : lengths[i]].tolist() for i in range(len(docs))]

    # ----------------------------------------------------------------- decode

    def decode(self, token_ids: Sequence[int]) -> bytes:
        """Decode token ids back to bytes (reference
        basic_tokenizer.zig:90-138) — iterative memoized expansion with O(1)
        table lookups instead of the reference's linear scans + recursion."""
        table = {nt: (a, b) for a, b, nt in self.merges}
        memo: dict[int, bytes] = {}

        def expand(tok: int) -> bytes:
            if tok < VOCAB_START:
                if tok < 0:
                    raise InvalidTokenError(f"invalid token id {tok}")
                return bytes([tok])
            stack = [tok]
            in_progress = set()
            while stack:
                t = stack[-1]
                if t in memo or t < VOCAB_START:
                    stack.pop()
                    continue
                if t not in table:
                    raise InvalidTokenError(f"unknown token id {t}")
                a, b = table[t]
                pending = [x for x in (a, b) if x >= VOCAB_START and x not in memo]
                if pending:
                    if t in in_progress:
                        raise InvalidTokenError(f"cyclic merge table at token {t}")
                    in_progress.add(t)
                    stack.extend(pending)
                else:
                    memo[t] = b"".join(
                        bytes([x]) if x < VOCAB_START else memo[x] for x in (a, b)
                    )
                    in_progress.discard(t)
                    stack.pop()
            return memo[tok]

        return b"".join(expand(int(t)) for t in token_ids)

    # ------------------------------------------------------------------ serde

    def save_merges(self, path: str | os.PathLike) -> None:
        """Serialize to merges.txt format (basic_tokenizer.zig:319-330)."""
        serde.save(self.merges, path)

    def load_merges(self, path: str | os.PathLike) -> "BasicTokenizer":
        """Load a merges.txt model (basic_tokenizer.zig:332-348); replaces
        the current merge list."""
        self.merges = serde.load(path)
        self._device_merges = None
        self._grouped_merges = None
        return self

    @classmethod
    def from_merges_file(cls, path: str | os.PathLike) -> "BasicTokenizer":
        return cls(serde.load(path))

    # ------------------------------------------------------------------ misc

    @property
    def vocab_size(self) -> int:
        return VOCAB_START + len(self.merges)

    def __len__(self) -> int:
        return len(self.merges)
