"""Pallas TPU kernels for the BPE hot path (SURVEY.md §7 Stage 2)."""

import jax

BLOCK = 256 * 128  # merge kernel GRID block size (block_rows=256 x 128 lanes)
# Stream layout granularity: ROW-LOCAL prefixes (each 128-lane row is a
# valid-token prefix with a PAD tail; see ops/pallas/merge.py layout
# contract). pair_streams(layout_block=LAYOUT) gives the logical adjacency.
LAYOUT = 128


def merge_kernel_supported(capacity: int) -> bool:
    """True when the fused merge kernel can run: TPU backend and a
    block-aligned capacity. Everything else falls back to the XLA path."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu" and capacity % BLOCK == 0 and capacity >= BLOCK


def encode_kernel_supported(row_length: int) -> bool:
    """True when the batched-replay encode kernel can run: TPU backend and
    a row length of R*128 lanes with 8 <= R <= 256 (the packed bit-move's
    15-bit in-row shift cap). Longer rows use the single-stream path; the
    XLA batch formulation (ops.encode_batch) is the portable fallback."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return (
        backend == "tpu"
        and row_length % 128 == 0
        and 8 <= row_length // 128 <= 256
    )
