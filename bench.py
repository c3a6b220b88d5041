"""Headline benchmark: BPE training throughput, bytes/s/chip.

Protocol (BASELINE.md: baselines are established by measurement — the
reference publishes none):

* Corpus: the reference conformance corpus tiled to BENCH_MB (default 32)
  megabytes (synthetic Zipf-ish bytes if the reference corpus is absent).
* Train 256 merges (vocab 256->512) on one chip, end to end (host->device
  transfer + all merge rounds), excluding compilation (warmup run first).
* ``vs_baseline``: speedup over the vectorized NumPy host backend (same
  algorithm, C-speed vector ops) measured on a slice and scaled — an
  honest stand-in for the reference-class single-core native loop, since
  the Zig reference itself publishes no numbers (BASELINE.json:13).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import pathlib
import sys
import time

BENCH_MB = int(os.environ.get("BENCH_MB", "32"))
MERGES = int(os.environ.get("BENCH_MERGES", "256"))
VOCAB = 256 + MERGES
BASELINE_SLICE = 2 * 1024 * 1024


def load_corpus(total_bytes: int) -> bytes:
    src = pathlib.Path("/root/reference/taylorswift.txt")
    if src.exists():
        seed = src.read_bytes()
    else:
        import numpy as np

        rng = np.random.default_rng(0)
        # Zipf-ish byte distribution so merge structure resembles text
        probs = 1.0 / np.arange(1, 97)
        probs /= probs.sum()
        seed = bytes(rng.choice(np.arange(32, 128), size=1 << 20, p=probs).astype(np.uint8))
    reps = (total_bytes + len(seed) - 1) // len(seed)
    return (seed * reps)[:total_bytes]


def main() -> None:
    # Persistent compilation cache: first bench run on a machine pays the
    # (slow, remote) compile once; subsequent runs measure steady state.
    import jax

    cache_dir = os.environ.get("JAX_CACHE_DIR", "/tmp/zigbpe_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from zigbpe_tpu import train as train_mod
    from zigbpe_tpu.models import numpy_backend

    data = load_corpus(BENCH_MB << 20)

    # Warmup: a full-protocol run so every capacity in the shrink schedule
    # is compiled (and lands in the persistent cache) before timing.
    train_mod.train(data, VOCAB, chunk_rounds=64)

    # Best of 2 timed runs: the tunneled host->device transfer has
    # multi-second run-to-run variance unrelated to the device path.
    wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        merges = train_mod.train(data, VOCAB, chunk_rounds=64)
        wall = min(wall, time.perf_counter() - t0)
        assert len(merges) == MERGES, f"expected {MERGES} merges, got {len(merges)}"
    device_bps = len(data) / wall

    # NumPy host baseline on a slice (linear in corpus bytes per round);
    # best of 2, symmetric with the device measurement.
    base_slice = data[:BASELINE_SLICE]
    base_wall = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        base_merges = numpy_backend.train(base_slice, VOCAB)
        base_wall = min(base_wall, time.perf_counter() - t0)
    baseline_bps = len(base_slice) / base_wall
    del base_merges

    print(
        json.dumps(
            {
                "metric": f"bpe_train_throughput_{MERGES}merges_{BENCH_MB}MB",
                "value": round(device_bps / 1e6, 3),
                "unit": "MB/s/chip",
                "vs_baseline": round(device_bps / baseline_bps, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
