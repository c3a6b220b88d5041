"""Command-line interface.

The reference has no CLI — every parameter is hardcoded in main.zig
(corpus path :16, vocab 300 :21, merges path :22, probe string :25;
SURVEY.md §5 "Config / flag system — ABSENT"). This is the real flag
system the new framework adds: train / encode / decode / demo, with
backend, mesh, and chunking knobs.
"""

from __future__ import annotations

import argparse
import sys
import time

from .models.basic_tokenizer import BasicTokenizer
from .utils import fileio

# main.zig:25 probe string, reproduced by `demo`
PROBE = "hello world!!!? (안녕하세요!) lol123 😉"


def _add_backend(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--backend",
        choices=["auto", "device", "host", "oracle", "dp"],
        default="auto",
        help="device=jitted JAX, host=NumPy, oracle=pure Python, dp=data-parallel mesh",
    )


def cmd_train(args) -> int:
    import os

    nproc = args.num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if nproc > 1:
        # multi-host run: bring up jax.distributed, load only this host's
        # device slices, train data-parallel over the global mesh
        from .parallel import multihost

        multihost.initialize(args.coordinator, args.num_processes, args.process_id)
        tok = BasicTokenizer()
        t0 = time.time()
        tok.merges = multihost.train_from_files(
            args.corpus, args.vocab, chunk_rounds=args.chunk_rounds,
            verbose=args.verbose, checkpoint_dir=args.checkpoint_dir,
        )
        wall = time.time() - t0
        if multihost.process_info()[0] == 0:
            tok.save_merges(args.out)
            print(
                f"trained {len(tok.merges)} merges in {wall * 1e3:.0f} ms -> {args.out}",
                file=sys.stderr,
            )
        return 0

    data = fileio.read_corpus(args.corpus)
    tok = BasicTokenizer()
    t0 = time.time()
    if args.backend == "dp":
        from .parallel import train_dp as dp

        tok.merges = dp.train_dp(
            data, args.vocab, chunk_rounds=args.chunk_rounds,
            verbose=args.verbose, checkpoint_dir=args.checkpoint_dir,
        )
    else:
        backend = "device" if args.backend == "auto" else args.backend
        kwargs = {}
        if backend == "device":
            kwargs["chunk_rounds"] = args.chunk_rounds
            if args.checkpoint_dir:
                kwargs["checkpoint_dir"] = args.checkpoint_dir
            if args.time_stats_detailed:
                kwargs["detailed_stats"] = True
        tok.train(data, args.vocab, verbose=args.verbose, backend=backend, **kwargs)
    wall = time.time() - t0
    tok.save_merges(args.out)
    print(
        f"trained {len(tok.merges)} merges on {len(data)} bytes in {wall * 1e3:.0f} ms "
        f"({len(data) / max(wall, 1e-9) / 1e6:.1f} MB/s) -> {args.out}",
        file=sys.stderr,
    )
    if args.time_stats or args.time_stats_detailed:
        tok.time_stats.print_report()
    return 0


def cmd_encode(args) -> int:
    tok = BasicTokenizer.from_merges_file(args.merges)
    if args.file:
        data = fileio.read_file(args.file)
    else:
        data = args.text.encode("utf-8")
    backend = args.backend if args.backend != "dp" else "device"
    ids = tok.encode(data, backend=backend)
    # main.zig:28-30 prints ids space-separated
    print(" ".join(str(i) for i in ids))
    return 0


def cmd_decode(args) -> int:
    tok = BasicTokenizer.from_merges_file(args.merges)
    if args.file:
        ids = [int(t) for t in fileio.read_file(args.file).split()]
    else:
        ids = [int(t) for t in args.ids.replace(",", " ").split()]
    sys.stdout.buffer.write(tok.decode(ids))
    sys.stdout.buffer.write(b"\n")
    return 0


def cmd_demo(args) -> int:
    """Reproduce the reference demo (main.zig:8-43): read corpus ->
    train(vocab) -> serialize merges -> encode probe -> decode -> timing."""
    data = fileio.read_file(args.corpus)
    tok = BasicTokenizer()
    t0 = time.time()
    backend = "device" if args.backend in ("auto", "dp") else args.backend
    tok.train(data, args.vocab, backend=backend)
    tok.save_merges(args.out)
    ids = tok.encode(PROBE)
    print(" ".join(str(i) for i in ids))
    print(tok.decode(ids).decode("utf-8"))
    print(f"Training completed in {(time.time() - t0) * 1e3:.0f} ms", file=sys.stderr)
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="zigbpe", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a merge table on a corpus")
    t.add_argument("corpus", nargs="+", help="corpus file(s), concatenated")
    t.add_argument("--vocab", type=int, default=300)
    t.add_argument("--out", default="merges.txt")
    t.add_argument("--verbose", action="store_true")
    t.add_argument("--chunk-rounds", type=int, default=64)
    t.add_argument("--time-stats", action="store_true")
    t.add_argument(
        "--time-stats-detailed", action="store_true",
        help="per-round sort/replace device-time split (reference "
        "TimeStats taxonomy; slower: syncs every round)",
    )
    t.add_argument("--checkpoint-dir", help="write/resume mid-training checkpoints here")
    # multi-host runtime (jax.distributed); also settable via
    # JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    t.add_argument("--coordinator", help="coordinator host:port for multi-host runs")
    t.add_argument("--num-processes", type=int, help="total process count (multi-host)")
    t.add_argument("--process-id", type=int, help="this process's id (multi-host)")
    _add_backend(t)
    t.set_defaults(fn=cmd_train)

    e = sub.add_parser("encode", help="encode text/file to token ids")
    e.add_argument("--merges", required=True)
    g = e.add_mutually_exclusive_group(required=True)
    g.add_argument("--text")
    g.add_argument("--file")
    _add_backend(e)
    e.set_defaults(fn=cmd_encode)

    d = sub.add_parser("decode", help="decode token ids to text")
    d.add_argument("--merges", required=True)
    g = d.add_mutually_exclusive_group(required=True)
    g.add_argument("--ids", help="ids, space- or comma-separated")
    g.add_argument("--file", help="file of whitespace-separated ids")
    d.set_defaults(fn=cmd_decode)

    g = sub.add_parser("gui", help="interactive tokenizer shell (reference GUI analogue)")
    g.add_argument("--merges", help="merge table; omitted = mirror-only (reference parity)")
    g.set_defaults(fn=lambda a: (__import__("zigbpe_tpu.gui.app", fromlist=["run"]).run(a.merges), 0)[1])

    m = sub.add_parser("demo", help="reference demo: train + probe round-trip")
    m.add_argument("--corpus", default="/root/reference/taylorswift.txt")
    m.add_argument("--vocab", type=int, default=300)
    m.add_argument("--out", default="merges.txt")
    _add_backend(m)
    m.set_defaults(fn=cmd_demo)

    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
