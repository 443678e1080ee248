"""Harness, session, CLI, reporting and plot.py round-trip tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dip_benchmark_tpu import spec
from dip_benchmark_tpu.harness import BenchmarkRunner, Operation
from dip_benchmark_tpu.session import BenchmarkSession
from dip_benchmark_tpu.utils import reporting
from dip_benchmark_tpu.utils.image import load_image, save_image
from dip_benchmark_tpu.utils.timing import measure_time


def test_measure_time_two_phase():
    calls = []
    once, per_round = measure_time(lambda: calls.append(1), rounds=10)
    assert len(calls) == 11  # 1 warm + 10 timed
    assert once >= 0 and per_round >= 0


def test_row_format_matches_reference():
    r = reporting.OpResult("Inversion", "inversion", "Inversion",
                           0.357799, 0.000463)
    row = reporting.format_row(r, width=len("Inversion"))
    # Byte format of opencv/benchmark.py:111 & sycl/benchmark.cpp:368.
    assert row == ("| Inversion |   0.357799s (once) "
                   "|   0.000463s (10000 times) |")


def test_csv_round_trip(tmp_path):
    results = [reporting.OpResult(d, p, c, 0.01, 0.001 * (i + 1))
               for i, (d, p, c) in enumerate(spec.OPERATION_MATRIX)]
    csv = tmp_path / "results.csv"
    reporting.write_csv(str(csv), "TPU", results)
    lines = csv.read_text().strip().split("\n")
    assert lines[0] == spec.CSV_HEADER
    assert lines[1].startswith("TPU,0.001000,0.002000,")
    # overwrite same tool, add another
    reporting.write_csv(str(csv), "TPU", results)
    reporting.write_csv(str(csv), "TPU-xla", results)
    lines = csv.read_text().strip().split("\n")
    assert len(lines) == 3


def test_session_rejects_rgba():
    """channels must be 3: grayscale's flat (H, W*3)%3 math would emit
    garbage luma on an RGBA array instead of a clear error."""
    from dip_benchmark_tpu.session import BenchmarkSession
    with pytest.raises(ValueError, match="3 channels"):
        BenchmarkSession(np.zeros((16, 16, 4), np.uint8))


def test_p95_nearest_rank():
    from dip_benchmark_tpu.utils.timing import p95_nearest_rank
    assert p95_nearest_rank(list(range(1, 21))) == 19   # NOT the max (20)
    assert p95_nearest_rank(list(range(1, 101))) == 95
    assert p95_nearest_rank(list(range(1, 11))) == 10   # ceil(9.5) = 10th
    assert p95_nearest_rank([7]) == 7


def test_csv_crlf_file_keeps_other_rows(tmp_path):
    """A CRLF results.csv (Windows checkout / copied asset) must not
    fail the header match and silently drop the other tools' rows."""
    results = [reporting.OpResult(d, p, c, 0.01, 0.001)
               for d, p, c in spec.OPERATION_MATRIX]
    csv = tmp_path / "results.csv"
    reporting.write_csv(str(csv), "CUDA", results)
    csv.write_bytes(csv.read_text().replace("\n", "\r\n").encode())
    reporting.write_csv(str(csv), "TPU", results)
    lines = csv.read_text().strip().split("\n")
    assert len(lines) == 3 and lines[1].startswith("CUDA,")


def test_csv_refuses_foreign_file(tmp_path):
    """Updating a file whose header isn't the reference schema must
    error, never rewrite it (the contract is replace-my-row)."""
    results = [reporting.OpResult(d, p, c, 0.01, 0.001)
               for d, p, c in spec.OPERATION_MATRIX]
    path = tmp_path / "notes.csv"
    path.write_text("Tool,Some,Other,Header\nx,1,2,3\n")
    with pytest.raises(ValueError, match="header"):
        reporting.write_csv(str(path), "TPU", results)
    assert "Other,Header" in path.read_text()  # untouched


def test_plots_tolerate_partial_rows(tmp_path):
    """csv_row writes '' for ops a partial run didn't cover; the chart
    renderers must skip those cells, not crash on float('')."""
    pytest.importorskip("matplotlib")
    from dip_benchmark_tpu.utils import plots
    partial = [reporting.OpResult(d, p, c, 0.01, 0.001)
               for d, p, c in spec.OPERATION_MATRIX
               if c not in ("Upload", "Download")]
    csv = tmp_path / "results.csv"
    reporting.write_csv(str(csv), "TPU", partial)
    written = plots.render_group_charts(str(csv), str(tmp_path))
    assert written  # memory-operations group renders with empty cells


def test_csv_readable_by_plotpy_parser(tmp_path):
    """plot.py:6-18 parses with pandas; emulate its exact reads."""
    pd = pytest.importorskip("pandas")
    results = [reporting.OpResult(d, p, c, 0.01, 0.000123)
               for d, p, c in spec.OPERATION_MATRIX]
    csv = tmp_path / "results.csv"
    reporting.write_csv(str(csv), "TPU", results)
    df = pd.read_csv(csv)
    assert [t for t in df["Tool"]] == ["TPU"]
    ops = [col for col in df.columns if col != "Tool"]
    assert ops == list(spec.CSV_COLUMNS)
    data = {op: [row / 10000 * 1e9 for row in df[op]] for op in ops}
    assert abs(data["Upload"][0] - 12.3) < 1e-9


@pytest.mark.parametrize("path", ["xla", "pallas"])
def test_session_end_to_end(path, fundus_crop, tmp_path):
    session = BenchmarkSession(fundus_crop, path=path)
    runner = BenchmarkRunner(session.operations(), rounds=2)
    results = runner.run(filename="crop.png", outdir=str(tmp_path),
                         verify_against=fundus_crop, quiet=True)
    assert len(results) == 14
    # image dumps: one per non-empty prefix, none for Upload/Download
    files = sorted(os.listdir(tmp_path))
    expected = sorted(f"{p}-crop.png" for _, p, _ in spec.OPERATION_MATRIX if p)
    assert files == expected
    # saved images decode back to the verified op outputs
    inv = load_image(str(tmp_path / "inversion-crop.png"))
    np.testing.assert_array_equal(inv, 255 - fundus_crop)


def test_session_verify_catches_corruption(fundus_crop):
    session = BenchmarkSession(fundus_crop, path="xla")
    ops = session.operations()
    bad = [Operation(o.description, o.prefix, o.csv_column, o.run,
                     (lambda o=o: np.zeros_like(fundus_crop))
                     if o.csv_column == "Inversion" else o.fetch)
           for o in ops]
    runner = BenchmarkRunner(bad, rounds=1)
    with pytest.raises(AssertionError, match="Inversion"):
        runner.run(verify_against=fundus_crop, quiet=True)


def test_cli_end_to_end(fundus_crop, tmp_path):
    img_path = tmp_path / "in.png"
    save_image(str(img_path), fundus_crop)
    outdir = tmp_path / "out"
    csv = tmp_path / "results.csv"
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               DIP_FORCE_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "benchmarks/tpu/benchmark.py", str(img_path),
         str(outdir), "--rounds", "1", "--backend", "cpu", "--path", "xla",
         "--csv", str(csv), "--verify"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [ln for ln in proc.stdout.splitlines() if ln.startswith("| ")]
    assert len(rows) == 14
    assert csv.exists()
    assert (outdir / "copy-in.png").exists()


def test_cli_positional_rounds(fundus_crop, tmp_path):
    """The C++ siblings' positional rounds spelling works alongside
    --rounds [sycl/benchmark.cpp:393-426]."""
    img_path = tmp_path / "in.png"
    save_image(str(img_path), fundus_crop)
    env = dict(os.environ, JAX_PLATFORMS="cpu", DIP_FORCE_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "benchmarks/tpu/benchmark.py", str(img_path),
         str(tmp_path / "out"), "3", "--backend", "cpu", "--path", "xla"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.count("(3 times)") == 14


def test_stats_collection(fundus_crop):
    session = BenchmarkSession(fundus_crop, path="xla")
    runner = BenchmarkRunner(session.operations(), rounds=3, stats=True)
    runner.run(verify_against=None, quiet=True)
    assert set(runner.op_stats) == set(spec.CSV_COLUMNS)
    for d in runner.op_stats.values():
        assert d["min"] <= d["p50"] <= d["p95"] <= d["max"]


def test_chained_mode(fundus_crop):
    session = BenchmarkSession(fundus_crop, path="xla")
    ops = session.chained_operations(4, include_pipeline=True)
    assert len(ops) == 13  # 12 device ops + pipeline, no Upload/Download
    runner = BenchmarkRunner(ops, rounds=1)
    results = runner.run(quiet=True)
    assert all(r.prefix == "" for r in results)


def test_execution_table(fundus_crop):
    """The --exec measurement path: chained-K marginal on both paths.

    On CPU block_until_ready does sync, so values are real but tiny; the
    assertion is structural (12 device rows + pipeline, non-negative)."""
    for path in ("xla", "pallas"):
        session = BenchmarkSession(fundus_crop, path=path)
        rows = session.execution_table(include_pipeline=True,
                                       k1=2, k2=6, samples=2)
        cols = [c for c, _ in rows]
        # Every op is shape-preserving (round-2 kernel scheme), so chains
        # compose directly and no Passthrough correction row is needed —
        # execution_table detects this via eval_shape rather than assuming.
        assert len(cols) == 13 and cols[-1] == "Fused-Pipeline"
        assert "Passthrough" not in cols
        assert "Upload" not in cols and "Download" not in cols
        assert all(t >= 0.0 for _, t in rows)
    # the f32 data model is supported too (both paths)
    f32_rows = BenchmarkSession(fundus_crop, path="pallas",
                                dtype="float32").execution_table(
        k1=2, k2=6, samples=2)
    f32_cols = [c for c, _ in f32_rows]
    assert len(f32_rows) == 12 and "Passthrough" not in f32_cols
    assert all(t >= 0.0 for _, t in f32_rows)


def test_tiny_image_rejected():
    img = np.zeros((3, 4, 3), np.uint8)
    with pytest.raises(ValueError, match="5x5"):
        BenchmarkSession(img, path="xla")


def test_reference_plot_py_ingests_our_csv(fundus_crop, tmp_path):
    """Drop-in reporting proof: the REFERENCE's unmodified plot.py consumes
    a results.csv containing our programmatically written row and renders
    its five PNGs. Skipped when the reference tree or pandas is absent."""
    from dip_benchmark_tpu.utils.testimage import ref_path
    ref_plot = ref_path("plot.py")
    if not os.path.exists(ref_plot):
        pytest.skip("reference tree not mounted")
    pytest.importorskip("pandas")

    session = BenchmarkSession(fundus_crop, path="xla")
    runner = BenchmarkRunner(session.operations(), rounds=1)
    runner.run(quiet=True)
    assets = tmp_path / "assets"
    assets.mkdir()
    # reference rows + ours, like the shipped assets/results.csv
    runner.write_csv(str(assets / "results.csv"), tool="TPU")
    import shutil
    shutil.copy(ref_plot, tmp_path / "plot.py")
    proc = subprocess.run(
        [sys.executable, "plot.py"], cwd=tmp_path,
        capture_output=True, text=True,
        env=dict(os.environ, MPLBACKEND="Agg", JAX_PLATFORMS="cpu"))
    assert proc.returncode == 0, proc.stderr[-2000:]
    pngs = sorted(p.name for p in assets.glob("*.png"))
    assert len(pngs) == 5, pngs


def test_render_exec_chart(tmp_path):
    """The exec-vs-reference chart renders from a bench JSON's per-op
    exec_us rows (VERDICT r2 'missing' item 5)."""
    pytest.importorskip("matplotlib")
    import json

    from dip_benchmark_tpu.utils.plots import render_exec_chart
    csv_path = tmp_path / "results.csv"
    cols = [c for c in __import__(
        "dip_benchmark_tpu.spec", fromlist=["spec"]).CSV_COLUMNS]
    with open(csv_path, "w") as f:
        f.write("Tool," + ",".join(cols) + "\n")
        f.write("CUDA," + ",".join("0.001" for _ in cols) + "\n")
        f.write("TPU," + ",".join("0.0001" for _ in cols) + "\n")
    bench = {"ops": {c: {"p50_us": 25.0, "exec_us": 100.0}
                     for c in cols if c not in ("Upload", "Download")}}
    jpath = tmp_path / "bench.json"
    jpath.write_text(json.dumps(bench))
    out = render_exec_chart(str(csv_path), str(jpath),
                            str(tmp_path / "exec.png"))
    assert os.path.exists(out) and os.path.getsize(out) > 10000


def test_chained_mode_all_surfaces(small_image):
    """--chained is a measurement mode on every path/model (round 3):
    each surface's ops are shape-preserving, so the k-chain compiles and
    runs; time_scale divides the per-round report."""
    for path in ("xla", "pallas"):
        for dtype in ("uint8", "float32"):
            s = BenchmarkSession(small_image, path=path, dtype=dtype)
            table = s.chained_operations(2, include_pipeline=True)
            assert len(table) == 13
            assert all(op.time_scale == 2 for op in table)
            table[0].run()
            table[-1].run()


def test_cli_rejects_bad_knob_values(tmp_path):
    """Known-invalid invocations exit 2 BEFORE the device gate or any
    compile work (negative K/N previously produced negative times or a
    raw traceback; fuse+chained was checked only after minutes of warm)."""
    from dip_benchmark_tpu import cli
    from dip_benchmark_tpu.utils.image import save_image
    img = tmp_path / "t.png"
    save_image(str(img), np.zeros((16, 16, 3), np.uint8))
    base = [str(img), str(tmp_path / "out"), "--backend", "cpu"]
    assert cli.main(base + ["--chained", "0"]) == 2
    assert cli.main(base + ["--chained", "-5"]) == 2
    assert cli.main(base + ["--shards", "-2"]) == 2
    assert cli.main(base + ["--fuse", "Grayscale,Threshold",
                            "--chained", "2"]) == 2


def test_cli_warm_covers_chained_programs(tmp_path):
    """--warm + --chained must pre-run the actual chained programs (the
    table the run times), not just the base ops."""
    from dip_benchmark_tpu import cli
    from dip_benchmark_tpu.utils.image import save_image
    rng = np.random.default_rng(77)
    img = tmp_path / "t.png"
    save_image(str(img), rng.integers(0, 256, (16, 16, 3), np.uint8))
    rc = cli.main([str(img), str(tmp_path / "out"), "--backend", "cpu",
                   "--rounds", "1", "--warm", "--chained", "2"])
    assert rc == 0


def test_cli_csv_foreign_header_exits_gated(tmp_path):
    """write_csv's foreign-schema refusal reaches the user as the gated
    exit-2 message, not a raw traceback, and leaves the file untouched
    (round-5 review)."""
    from dip_benchmark_tpu import cli
    from dip_benchmark_tpu.utils.image import save_image
    img = tmp_path / "t.png"
    save_image(str(img), np.zeros((16, 16, 3), np.uint8))
    csv = tmp_path / "notes.csv"
    csv.write_text("col_a,col_b\n1,2\n")
    rc = cli.main([str(img), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--path", "xla",
                   "--csv", str(csv)])
    assert rc == 2
    assert csv.read_text() == "col_a,col_b\n1,2\n"
