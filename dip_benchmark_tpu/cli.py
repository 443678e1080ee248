"""L4 CLI: the reference's three-argument contract plus TPU-framework knobs.

Reference contract [opencv/benchmark.py:124-127, cuda/benchmark.jl:135-152,
sycl/benchmark.cpp:389-426]: positional infile + outdir, --rounds default
10000, device-availability gate, device banner, then run the benchmark.

Added knobs (SURVEY.md §5 config plan): --path {pallas,xla}, --backend
{tpu,cpu,any}, --csv <file>, --tool <name>, --verify, --profile <dir>,
--exec (true per-application device execution time).
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser, ArgumentTypeError

import numpy as np

from .harness import BenchmarkRunner
from .runtime import DeviceGateError, describe_device, gate_backend
from .session import BenchmarkSession
from .utils.image import is_image_file, load_image


def parse_image(string: str) -> tuple[np.ndarray, str]:
    if not is_image_file(string):
        raise ArgumentTypeError("Not a valid image file")
    return (load_image(string), os.path.basename(string))


def parse_dir(string: str) -> str:
    if os.path.exists(string) and not os.path.isdir(string):
        raise ArgumentTypeError("Not a valid directory")
    os.makedirs(string, exist_ok=True)
    return string


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(
        prog="benchmark.py",
        description="Image processing algorithms benchmark with TPU "
                    "(JAX/XLA/Pallas) acceleration")
    parser.add_argument("infile", type=parse_image,
                        help="Path to image file")
    parser.add_argument("outdir", type=parse_dir,
                        help="Path to image output directory")
    # Both rounds spellings from the reference suite: the Python sibling
    # uses --rounds (opencv/benchmark.py:127), the C++ siblings a third
    # positional (sycl/benchmark.cpp:393-426). The flag wins if both given.
    parser.add_argument("rounds_pos", type=int, nargs="?", default=None,
                        metavar="rounds",
                        help="Times to be executed (positional form, "
                             "like the SYCL/VisionGL backends)")
    parser.add_argument("--rounds", type=int, default=None,
                        help="Times to be executed, default 10000")
    parser.add_argument("--path", choices=["pallas", "xla"], default="pallas",
                        help="Execution path: hand-written Pallas kernels "
                             "(default) or jitted XLA library calls")
    parser.add_argument("--backend", choices=["tpu", "cpu", "any"],
                        default="tpu", help="Device backend gate")
    parser.add_argument("--dtype", choices=["uint8", "float32"],
                        default="uint8",
                        help="Data model: uint8 HWC (primary) or the "
                             "CUDA.jl-parity float32 planar-CHW [0,1] "
                             "variant (both paths)")
    parser.add_argument("--csv", default=None,
                        help="Also write/update a results.csv at this path")
    parser.add_argument("--tool", default=None,
                        help="Tool name for the CSV row (default TPU-<path>)")
    parser.add_argument("--verify", action="store_true",
                        help="Check every op output bit-exactly against the "
                             "NumPy oracle before reporting")
    parser.add_argument("--pipeline", action="store_true",
                        help="Add a 15th row: the fused "
                             "grayscale+threshold+erosion+blur pipeline "
                             "as a single kernel")
    parser.add_argument("--fuse", metavar="COL,COL,...", default=None,
                        help="Add a row running an ARBITRARY op chain fused "
                             "into ONE kernel (models/chain.py): "
                             "comma-separated CSV column names, e.g. "
                             "'Grayscale,Threshold,Erosion-3x3-Square'. "
                             "Pallas path (both data models); Grayscale "
                             "only first; total radius <= 8")
    parser.add_argument("--shards", type=int, default=0, metavar="N",
                        help="Run the op matrix row-sharded across N devices "
                             "(shard_map + ppermute halo exchange); "
                             "0 = single device. Beyond-envelope widths "
                             "route to the 2-D sharded-wide model (column "
                             "strips per row shard, parallel/wide.py)")
    parser.add_argument("--warm", action="store_true",
                        help="AOT-compile all ops before timing (serving "
                             "mode: the 'once' column then shows warm "
                             "dispatch, not compile — unlike the reference "
                             "contract, so off by default)")
    parser.add_argument("--chained", type=int, default=None, metavar="K",
                        help="Measurement-only mode: time K in-graph chained "
                             "applications per round and report "
                             "per-application time (any path/model; "
                             "amortizes per-dispatch overhead — but see "
                             "--exec for completed-work time)")
    parser.add_argument("--mem-rounds", type=int, default=None, metavar="N",
                        help="Round count override for the host-transfer "
                             "ops (Upload/Download) only — on relay-tunneled "
                             "rigs those run at ms-to-second scale, so the "
                             "full 10000-round contract would take hours in "
                             "transfers alone; each row prints its own N. "
                             "Default: same as --rounds")
    parser.add_argument("--warmup", type=int, default=10, metavar="N",
                        help="DEVIATION from the reference timing protocol "
                             "(which starts the timed loop right after the "
                             "'once' call): N untimed post-compile calls "
                             "before each op's timed loop drain the compile "
                             "transport burst that otherwise congests the "
                             "first ~100ms of rounds on tunneled rigs "
                             "(capped at 1 for host-transfer ops). "
                             "Default 10; pass 0 for the strict reference "
                             "protocol")
    parser.add_argument("--stats", action="store_true",
                        help="Print per-op latency distribution "
                             "(min/p50/p95/max) under each row")
    parser.add_argument("--exec", dest="exec_table", action="store_true",
                        help="After the benchmark, print each op's TRUE "
                             "device execution time per application "
                             "(chained-K marginal with forced completion; "
                             "see runtime/exec_timing.py — the repeated "
                             "column is a dispatch-rate number on relay "
                             "rigs). Works with --shards (the marginal "
                             "lifts over the shard_map programs). "
                             "No --chained")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="Capture a jax.profiler trace of the run")
    return parser


def _make_session(args, image, device, needs_wide: bool):
    """Route to the session flavor the (width, --shards, --path) combo
    needs. May raise ValueError for envelope/size/shard-fit contract
    failures (main() delivers those gated, with exit code 2)."""
    if args.shards:
        if needs_wide:
            # Beyond-envelope width under --shards: the 2-D strips-per-
            # shard session (parallel/wide.py — column strips per row
            # shard, row halos over ICI + column seams local, bit-exact,
            # tests/test_sharded_wide.py).
            from .parallel.wide import ShardedWideBenchmarkSession
            session = ShardedWideBenchmarkSession(
                image, n_devices=args.shards, dtype=args.dtype)
            print(f"NOTE: width {image.shape[1]} exceeds the "
                  f"single-buffer envelope; using the sharded-wide model "
                  f"({session.wl.n_strips} strips of "
                  f"{session.wl.strip_width} per row shard, "
                  f"{args.shards} shards)", file=sys.stderr)
            return session
        from .parallel.session import ShardedBenchmarkSession
        return ShardedBenchmarkSession(
            image, n_devices=args.shards, path=args.path, dtype=args.dtype)
    if needs_wide:
        # Width past the single-buffer VMEM envelope: run the column-strip
        # resident model (models/wide.py) — same kernels, N strips, seam
        # refresh per windowed application. Full feature parity with the
        # single-buffer session: --warm (aot.warm compiles the strip ops),
        # --chained (the fori_loop carries the strip pytree), --fuse (one
        # fused chain kernel per strip, wide_fused_chain).
        from .models.wide import WideBenchmarkSession
        session = WideBenchmarkSession(image, dtype=args.dtype,
                                       device=device)
        print(f"NOTE: width {image.shape[1]} exceeds the single-buffer "
              f"envelope; using the column-strip resident model "
              f"({session.wl.n_strips} strips of {session.wl.strip_width})",
              file=sys.stderr)
        return session
    return BenchmarkSession(image, path=args.path, device=device,
                            dtype=args.dtype)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .runtime.cache import enable_compilation_cache
    enable_compilation_cache()

    # Pure-flag validation BEFORE the device gate and any compiles — a
    # known-invalid invocation must not burn minutes of warm/trace first.
    if args.exec_table and args.chained:
        print("--exec is incompatible with --chained", file=sys.stderr)
        return 2
    if args.fuse and args.chained:
        print("--fuse is incompatible with --chained", file=sys.stderr)
        return 2
    if args.chained is not None and args.chained < 1:
        print(f"--chained needs K >= 1, got {args.chained}", file=sys.stderr)
        return 2
    if args.shards < 0:
        print(f"--shards needs N >= 0, got {args.shards}", file=sys.stderr)
        return 2

    try:
        device = gate_backend(args.backend)
    except DeviceGateError as e:
        print(str(e), file=sys.stderr)
        return 4  # same role as the SYCL no-GPU exit code
    print(describe_device(device))

    image, filename = args.infile
    needs_wide = False
    if args.path == "pallas":
        from .utils.image import fit_band
        needs_wide = fit_band(
            image.shape[1],
            itemsize=4 if args.dtype == "float32" else 1) == 0
    try:
        session = _make_session(args, image, device, needs_wide)
    except ValueError as e:
        # Envelope/size/shard-fit contract failures carry remedy text;
        # deliver it the gated way, not as a raw traceback.
        print(f"benchmark: {e}", file=sys.stderr)
        return 2
    if args.chained:
        # ShardedBenchmarkSession has no chained surface; the other three
        # flavors (single-buffer, wide, sharded-wide) all do.
        if args.verify or (args.shards and not needs_wide):
            print("--chained is measurement-only (no --verify; with "
                  "--shards only the sharded-wide route supports it)",
                  file=sys.stderr)
            return 2
        try:
            table = session.chained_operations(
                args.chained, include_pipeline=args.pipeline)
        except ValueError as e:
            # e.g. the fused pipeline's VMEM-envelope refusal
            print(f"benchmark: {e}", file=sys.stderr)
            return 2
    else:
        try:
            table = session.operations(include_pipeline=args.pipeline)
        except ValueError as e:
            print(f"benchmark: {e}", file=sys.stderr)
            return 2
    if args.fuse:
        try:
            table.append(session.chain_operation(
                [c.strip() for c in args.fuse.split(",") if c.strip()]))
        except (ValueError, AssertionError) as e:
            print(f"--fuse: {e}", file=sys.stderr)
            return 2
    if args.warm:
        # Warm the PROGRAMS the run will actually time — the base table,
        # the --chained fori_loop wrappers, and the --fuse chain alike
        # (aot.warm compiles only the base ops, which is not what a
        # chained/fused run times): one untimed application per op, so
        # the 'once' column shows warm dispatch, not compile. Download is
        # skipped — its first D2H flips relay rigs into degraded dispatch
        # mode before any timing (harness orders it last for the same
        # reason), and a D2H compiles nothing anyway.
        for op in table:
            if not op.downloads:
                op.run()
    rounds = (args.rounds if args.rounds is not None
              else args.rounds_pos if args.rounds_pos is not None
              else 10000)
    overrides = ({"Upload": args.mem_rounds, "Download": args.mem_rounds}
                 if args.mem_rounds is not None else None)
    runner = BenchmarkRunner(table, rounds=rounds, stats=args.stats,
                             warmup=args.warmup, rounds_override=overrides)

    def execute():
        runner.run(filename=filename, outdir=args.outdir,
                   verify_against=image if args.verify else None,
                   verify_ops=session.oracle_ops() if args.verify else None,
                   verify_atol=session.verify_atol)

    if args.profile:
        import jax
        with jax.profiler.trace(args.profile):
            execute()
    else:
        execute()

    if args.csv:
        try:
            runner.write_csv(args.csv,
                             tool=args.tool or f"TPU-{args.path}")
        except ValueError as e:
            # write_csv refuses to rewrite a foreign-schema file; the
            # measured rows are already on stdout — deliver the refusal
            # the gated way, not as a raw traceback.
            print(f"--csv: {e}", file=sys.stderr)
            return 2

    # Execution-time table LAST: its forced-completion D2H flips relay rigs
    # into a degraded dispatch mode that would poison regular measurements.
    if args.exec_table:
        print("| device execution time per application "
              "(chained-K marginal) |")
        for col, t in session.execution_table(
                include_pipeline=args.pipeline, auto_scale=True):
            print(f"| {col:42s} | {t:10.6f}s |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
