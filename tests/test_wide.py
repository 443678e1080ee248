"""Column-strip resident model (models/wide.py): beyond-envelope widths.

Strip widths are forced tiny here so a small image exercises multiple
strips, both seam kinds (interior neighbor copy + outer mirror), a
remainder last strip, and arbitrary-depth composition — all in Pallas
interpret mode on CPU, bit-exact vs the NumPy oracle.
"""

import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.models import wide
from dip_benchmark_tpu.utils.image import LANE


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def test_wide_layout_plan():
    wl = wide.make_wide_layout(40, 300, strip_width=LANE)
    assert wl.n_strips == 3
    assert [lo.width for lo in wl.layouts] == [128, 128, 44]
    assert len({lo.band for lo in wl.layouts}) == 1
    assert len({lo.padded_height for lo in wl.layouts}) == 1
    # single-strip degenerate
    assert wide.make_wide_layout(40, 100, strip_width=LANE).n_strips == 1


def test_wide_default_strip_width_keeps_full_band():
    sw = wide.default_strip_width()
    assert sw % LANE == 0
    from dip_benchmark_tpu.utils.image import fit_band
    assert fit_band(sw) == 112
    # uint8 default stops at the MEASURED conv-5x5 compiler pass point
    # (Wp 5248), below the budget-admitted top (which sits in the
    # unmeasured pass/fail gap — module comment).
    assert sw == wide.MEASURED_SAFE_STRIP_U8


def test_wide_f32_plan_respects_f32_envelope():
    """Review regression: the f32 model's strips must be sized for
    4-byte VMEM windows — a uint8-sized plan would hand Mosaic a ~21 MiB
    working set against the 14.9 MiB budget."""
    from dip_benchmark_tpu.utils import image as im
    sw = wide.default_strip_width(itemsize=4)
    assert im.fit_band(sw, itemsize=4) == 112
    assert sw < wide.default_strip_width(itemsize=1)
    wl = wide.make_wide_layout(64, 3 * sw + 50, itemsize=4)
    for lo in wl.layouts:
        assert im.windowed_vmem_bytes(lo, 4) <= im.VMEM_BUDGET
    s = wide.WideBenchmarkSession(_img(8, 300), dtype="float32")
    assert s.wl.itemsize == 4
    with pytest.raises(AssertionError, match="itemsize=4"):
        wide.build_wide_ops_f32(wide.make_wide_layout(8, 300))


def test_wide_remainder_narrower_than_halo_merged():
    """Review regression: a remainder strip narrower than the halo
    cannot feed the seam refresh (its neighbor reads `halo` valid
    columns) — such remainders merge into the previous strip, and the
    previously-corrupting case composes bit-exactly."""
    wl = wide.make_wide_layout(16, 257, strip_width=LANE)
    assert [lo.width for lo in wl.layouts] == [128, 129]
    img = _img(16, 257, seed=37)
    strips = wide.put_wide(wide.to_wide_resident(img, wl))
    op = wide.build_wide_ops(wl)["Convolution-5x5"]
    want = img
    for _ in range(3):
        strips = op(strips)
        want = oracle.IMAGE_OPS["Convolution-5x5"](want)
    np.testing.assert_array_equal(wide.from_wide_resident(strips, wl), want)


def test_wide_aggregate_hbm_cap():
    """Review regression: the strip plan enforces the resident-buffer
    HBM cap in AGGREGATE, not just per strip."""
    with pytest.raises(ValueError, match="GiB"):
        wide.make_wide_layout(60_000, 60_000)


def test_wide_round_trip():
    img = _img(24, 333)
    wl = wide.make_wide_layout(24, 333, strip_width=LANE)
    strips = wide.to_wide_resident(img, wl)
    np.testing.assert_array_equal(wide.from_wide_resident(strips, wl), img)


@pytest.mark.parametrize("col", [
    "Inversion", "Grayscale", "Threshold", "Copy",
    "Erosion-3x3-Cross", "Erosion-3x3-Square", "Erosion-1x3+3x1-Square",
    "Convolution-3x3", "Convolution-1x3+3x1", "Convolution-5x5",
    "Convolution-1x5+5x1", "Gaussian-Blur-3x3", "Fused-Pipeline"])
def test_wide_ops_bit_exact(col):
    img = _img(21, 300)  # 3 strips: two interior seams + remainder strip
    wl = wide.make_wide_layout(21, 300, strip_width=LANE)
    strips = wide.put_wide(wide.to_wide_resident(img, wl))
    ops = wide.build_wide_ops(wl)
    got = wide.from_wide_resident(ops[col](strips), wl)
    np.testing.assert_array_equal(got, oracle.IMAGE_OPS[col](img),
                                  err_msg=col)


@pytest.mark.parametrize("col,k", [("Erosion-3x3-Square", 5),
                                   ("Convolution-5x5", 3),
                                   ("Gaussian-Blur-3x3", 4)])
def test_wide_composition_arbitrary_depth(col, k):
    """The resident contract: repeated applications through the strip
    model stay bit-exact at depths far beyond the pad budget (the halo
    refresh re-establishes seams every application)."""
    img = _img(16, 280, seed=11)
    wl = wide.make_wide_layout(16, 280, strip_width=LANE)
    strips = wide.put_wide(wide.to_wide_resident(img, wl))
    op = wide.build_wide_ops(wl)[col]
    want = img
    for _ in range(k):
        strips = op(strips)
        want = oracle.IMAGE_OPS[col](want)
    np.testing.assert_array_equal(wide.from_wide_resident(strips, wl), want)


def test_wide_chain_one_jit():
    img = _img(18, 290, seed=7)
    wl = wide.make_wide_layout(18, 290, strip_width=LANE)
    strips = wide.put_wide(wide.to_wide_resident(img, wl))
    chain = wide.wide_chain(
        wl, ("Inversion", "Erosion-3x3-Square", "Convolution-3x3"))
    got = wide.from_wide_resident(chain(strips), wl)
    want = oracle.IMAGE_OPS["Convolution-3x3"](
        oracle.IMAGE_OPS["Erosion-3x3-Square"](
            oracle.IMAGE_OPS["Inversion"](img)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("col", ["Inversion", "Grayscale",
                                 "Erosion-3x3-Square", "Convolution-5x5",
                                 "Gaussian-Blur-3x3", "Fused-Pipeline"])
def test_wide_f32_matches_oracle(col):
    from dip_benchmark_tpu import oracle_f32
    img = _img(17, 290, seed=13)
    wl = wide.make_wide_layout(17, 290, strip_width=LANE, itemsize=4)
    strips = wide.put_wide(wide.to_wide_resident_f32(img, wl))
    got = wide.from_wide_resident_f32(
        wide.build_wide_ops_f32(wl)[col](strips), wl)
    want = oracle_f32.IMAGE_OPS_F32[col](oracle_f32.from_uint8_hwc(img))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-7, err_msg=col)


def test_wide_f32_composition():
    from dip_benchmark_tpu import oracle_f32
    img = _img(16, 280, seed=17)
    wl = wide.make_wide_layout(16, 280, strip_width=LANE, itemsize=4)
    strips = wide.put_wide(wide.to_wide_resident_f32(img, wl))
    op = wide.build_wide_ops_f32(wl)["Erosion-3x3-Square"]
    want = oracle_f32.from_uint8_hwc(img)
    for _ in range(4):
        strips = op(strips)
        want = oracle_f32.IMAGE_OPS_F32["Erosion-3x3-Square"](want)
    # erosion is a selection (no arithmetic): exact even composed
    np.testing.assert_array_equal(
        wide.from_wide_resident_f32(strips, wl), want)


def test_wide_session_end_to_end(tmp_path):
    from dip_benchmark_tpu.harness import BenchmarkRunner
    img = _img(21, 300, seed=19)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    runner = BenchmarkRunner(s.operations(include_pipeline=True), rounds=2)
    results = runner.run(filename="w.png", outdir=str(tmp_path),
                         verify_against=img, verify_ops=s.oracle_ops(),
                         verify_atol=s.verify_atol, quiet=True)
    assert len(results) == 15
    assert (tmp_path / "inversion-w.png").exists()


def test_wide_session_f32(tmp_path):
    from dip_benchmark_tpu.harness import BenchmarkRunner
    img = _img(19, 290, seed=23)
    s = wide.WideBenchmarkSession(img, dtype="float32", strip_width=LANE)
    runner = BenchmarkRunner(s.operations(), rounds=1)
    results = runner.run(filename="w.png", outdir=str(tmp_path),
                         verify_against=img, verify_ops=s.oracle_ops(),
                         verify_atol=s.verify_atol, quiet=True)
    assert len(results) == 14


def test_wide_session_exec_table():
    img = _img(16, 280, seed=29)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    rows = s.execution_table(k1=1, k2=2, samples=1)
    assert [c for c, _ in rows] == [
        c for _, _, c in __import__(
            "dip_benchmark_tpu.spec", fromlist=["spec"]).OPERATION_MATRIX
        if c not in ("Upload", "Download")]
    assert all(t >= 0 for _, t in rows)


def test_cli_wide_fallback(tmp_path, monkeypatch, capsys):
    """An image the CLI's envelope probe deems too wide routes to the
    column-strip session and the full contract still runs green."""
    from dip_benchmark_tpu import cli
    from dip_benchmark_tpu.utils import image as image_mod
    from dip_benchmark_tpu.utils.image import save_image
    orig = image_mod.fit_band

    def fake(width, halo=image_mod.DEFAULT_HALO, itemsize=1, cap=112):
        # widths past 200 "exceed the envelope"; real strips (128-col)
        # still resolve through the true estimator
        return 0 if width > 200 else orig(width, halo, itemsize, cap)
    monkeypatch.setattr(image_mod, "fit_band", fake)
    img = _img(21, 300, seed=31)
    path = tmp_path / "wide.png"
    save_image(str(path), img)
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--verify"])
    assert rc == 0
    assert "column-strip resident model" in capsys.readouterr().err
    # full knob parity (round-5 VERDICT #3): --warm, --fuse (verified
    # against the chain's sequential oracle), and --chained all run on
    # the column-strip session
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--warm", "--verify",
                   "--fuse", "Grayscale,Threshold,Erosion-3x3-Square"])
    assert rc == 0
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--chained", "2"])
    assert rc == 0
    # --shards + beyond-envelope width routes to the sharded-wide
    # session (tests/test_sharded_wide.py covers that surface in depth)
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--shards", "2"])
    assert rc == 0
    assert "sharded-wide model" in capsys.readouterr().err


@pytest.mark.parametrize("col", ["Inversion", "Erosion-3x3-Square",
                                 "Convolution-5x5", "Fused-Pipeline"])
def test_wide_streaming_row_blocks(col):
    """apply_streaming: row blocks stitch bit-identically to the
    whole-image op (interior block edges bake true neighbor rows)."""
    img = _img(150, 300, seed=41)
    got = wide.apply_streaming(img, col, block_rows=64, strip_width=LANE)
    np.testing.assert_array_equal(got, oracle.IMAGE_OPS[col](img),
                                  err_msg=col)


@pytest.mark.parametrize("h", [33, 34])
def test_wide_streaming_short_remainder_block(h):
    """A last row block shorter than halo+1 (h % block_rows in {1, 2})
    folds into the previous block instead of crashing make_wide_layout's
    min-dims guard (round-5 review)."""
    img = _img(h, 300, seed=47)
    got = wide.apply_streaming(img, "Erosion-3x3-Square", block_rows=16,
                               strip_width=LANE)
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Erosion-3x3-Square"](img))


def test_wide_streaming_rejects_unknown_column():
    with pytest.raises(ValueError, match="unknown column"):
        wide.apply_streaming(_img(20, 300), "Upload", strip_width=LANE)


def test_f32_download_chunks_rows_not_planes():
    """The f32 planar (C, H, W) Download payload must chunk along rows
    (axis 1) so the chunked reader keeps its full pipeline depth, and
    the read must still round-trip exactly (wide + single-buffer)."""
    from dip_benchmark_tpu.session import BenchmarkSession
    img = _img(40, 300, seed=59)
    ws = wide.WideBenchmarkSession(img, dtype="float32", strip_width=LANE)
    np.testing.assert_array_equal(ws._download(), ws._mem_host)
    bs = BenchmarkSession(_img(40, 60, seed=60), dtype="float32")
    np.testing.assert_array_equal(bs._download(), bs._mem_host)


def test_wide_streaming_f32():
    """apply_streaming on the f32 model: stitched blocks match the f32
    oracle (erosion: selection, exact even across block seams)."""
    from dip_benchmark_tpu import oracle_f32
    img = _img(100, 290, seed=73)
    got = wide.apply_streaming(img, "Erosion-3x3-Square", block_rows=48,
                               strip_width=LANE, dtype="float32")
    want = oracle_f32.IMAGE_OPS_F32["Erosion-3x3-Square"](
        oracle_f32.from_uint8_hwc(img))
    assert got.dtype == np.float32 and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_wide_streaming_single_block_degenerate():
    img = _img(20, 280, seed=43)
    got = wide.apply_streaming(img, "Gaussian-Blur-3x3", block_rows=512,
                               strip_width=LANE)
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Gaussian-Blur-3x3"](img))


def test_wide_session_warm_and_export(tmp_path):
    """--warm on the strip model (round-5 VERDICT #3): aot.warm
    AOT-compiles the strip-list ops, and StableHLO export round-trips
    (the pytree arg spec is the strip list)."""
    import jax

    from dip_benchmark_tpu.runtime import aot
    img = _img(18, 290, seed=47)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    compiled = aot.warm(s)
    assert set(compiled) == set(s._ops)
    got = wide.from_wide_resident(
        jax.block_until_ready(compiled["Inversion"](s.strips_dev)), s.wl)
    np.testing.assert_array_equal(got, oracle.IMAGE_OPS["Inversion"](img))
    written = aot.export_ops(s, str(tmp_path))
    assert len(written) == len(s._ops)
    fn = aot.load_exported(str(tmp_path / "Threshold.stablehlo"))
    got = wide.from_wide_resident(fn(s.strips_dev), s.wl)
    np.testing.assert_array_equal(got, oracle.IMAGE_OPS["Threshold"](img))


def test_aot_table_rejects_unknown_session():
    from dip_benchmark_tpu.runtime import aot

    class Bogus:
        pass

    with pytest.raises(TypeError, match="WideBenchmarkSession"):
        aot.warm(Bogus())


def test_wide_chained_operations():
    """--chained on the strip model: the fori_loop carries the strip
    pytree; k in-graph applications compose exactly (checked against the
    k-fold oracle through the session's resident sample)."""
    img = _img(16, 280, seed=53)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    table = s.chained_operations(3, include_pipeline=True)
    assert [op.csv_column for op in table][-1] == "Fused-Pipeline"
    row = next(op for op in table if op.csv_column == "Erosion-3x3-Square")
    assert row.time_scale == 3
    row.run()
    want = img
    for _ in range(3):
        want = oracle.IMAGE_OPS["Erosion-3x3-Square"](want)
    np.testing.assert_array_equal(
        wide.from_wide_resident(s._sample, s.wl), want)


def test_wide_chain_operation_within_halo():
    """--fuse on the strip model, radius <= strip halo: ONE fused kernel
    per strip on the session's own resident strips, bit-exact vs the
    sequential oracle."""
    img = _img(21, 300, seed=59)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Square"]
    op = s.chain_operation(cols)
    op.run()
    want = img
    for c in cols:
        want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(op.fetch(), want)
    assert op.csv_column in s.oracle_ops()  # verify path wired
    # the chain row joins the exec table
    rows = s.execution_table(k1=1, k2=2, samples=1)
    assert rows[-1][0] == "Fused-Chain"


def test_wide_chain_operation_deep_halo():
    """--fuse with a chain radius past the strip halo: a deeper-halo
    strip plan is rebuilt (same strip width -> multiple strips, so the
    deep seams are exercised), still bit-exact vs sequential."""
    img = _img(20, 300, seed=61)
    s = wide.WideBenchmarkSession(img, strip_width=LANE)
    cols = ["Convolution-5x5", "Convolution-3x3"]  # ry = rx = 3 > halo 2
    op = s.chain_operation(cols)
    op.run()
    want = img
    for c in cols:
        want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(op.fetch(), want)


def test_wide_chain_operation_f32():
    from dip_benchmark_tpu import oracle_f32
    img = _img(18, 290, seed=67)
    s = wide.WideBenchmarkSession(img, dtype="float32", strip_width=LANE)
    cols = ["Grayscale", "Gaussian-Blur-3x3"]
    op = s.chain_operation(cols)
    op.run()
    x = oracle_f32.from_uint8_hwc(img)
    for c in cols:
        x = oracle_f32.IMAGE_OPS_F32[c](x)
    want = oracle_f32.to_uint8_hwc(x)
    np.testing.assert_allclose(op.fetch().astype(np.int32),
                               want.astype(np.int32), atol=1)


def test_wide_fused_chain_composes():
    """The resident contract holds for fused chains too: repeated chain
    applications (refresh + one fused kernel per strip) stay bit-exact."""
    img = _img(16, 280, seed=71)
    wl = wide.make_wide_layout(16, 280, strip_width=LANE)
    cols = ("Inversion", "Erosion-3x3-Cross")
    fn = wide.wide_fused_chain(wl, cols)
    strips = wide.put_wide(wide.to_wide_resident(img, wl))
    want = img
    for _ in range(3):
        strips = fn(strips)
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(wide.from_wide_resident(strips, wl), want)


def test_wide_fused_chain_halo_bound_error():
    wl = wide.make_wide_layout(16, 280, strip_width=LANE)  # halo 2
    with pytest.raises(ValueError, match="strip halo"):
        wide.wide_fused_chain(wl, ("Convolution-5x5", "Convolution-3x3"))


def test_deep_halo_too_small_image_refused():
    """Round-5 review: deep-halo plans on images shorter than the halo
    would silently corrupt the flip-based mirror refresh — both the wide
    plan and the single-buffer chain path refuse with a clear error."""
    with pytest.raises(ValueError, match="too small"):
        wide.make_wide_layout(6, 300, halo=6, strip_width=LANE)
    # the wide session's deep chain goes through the same guard
    s = wide.WideBenchmarkSession(_img(6, 300, seed=79), strip_width=LANE)
    with pytest.raises(ValueError, match="too small"):
        s.chain_operation(["Convolution-5x5"] * 3)  # r = 6 > height-1
    # single-buffer session, same bound
    from dip_benchmark_tpu.session import BenchmarkSession
    bs = BenchmarkSession(_img(6, 300, seed=83), path="pallas")
    with pytest.raises(ValueError, match="too small"):
        bs.chain_operation(["Convolution-5x5"] * 3)


def test_wide_session_honors_device():
    """Advisor r4: the wide session must place its buffers on the
    resolved --backend device, like BenchmarkSession."""
    import jax
    dev = jax.devices("cpu")[0]
    s = wide.WideBenchmarkSession(_img(8, 280), strip_width=LANE,
                                  device=dev)
    assert all(x.devices() == {dev} for x in s.strips_dev)
    assert s._upload().devices() == {dev}


def test_wide_matches_single_buffer_semantics():
    """A width INSIDE the envelope produces identical results through the
    wide model and the plain single-buffer path."""
    import jax
    from dip_benchmark_tpu.ops import pallas as pallas_ops
    from dip_benchmark_tpu.utils.image import (
        from_planar_padded, make_layout, to_planar_padded)
    img = _img(20, 310, seed=5)
    layout = make_layout(20, 310)
    single = pallas_ops.build_ops(layout)["Erosion-3x3-Cross"](
        jax.device_put(to_planar_padded(img, layout)))
    wl = wide.make_wide_layout(20, 310, strip_width=LANE)
    strips = wide.build_wide_ops(wl)["Erosion-3x3-Cross"](
        wide.put_wide(wide.to_wide_resident(img, wl)))
    np.testing.assert_array_equal(
        wide.from_wide_resident(strips, wl),
        from_planar_padded(np.asarray(single), layout))


def test_wide_streaming_tiny_interior_blocks():
    """block_rows at or below the plan halo must not crash interior
    blocks on make_wide_layout's min-dims guard (round-5 review): block
    heights are silently raised to halo+1 and the stitch stays
    bit-exact."""
    img = _img(40, 300, seed=48)
    got = wide.apply_streaming(img, "Erosion-3x3-Square", block_rows=2,
                               strip_width=LANE)
    np.testing.assert_array_equal(
        got, oracle.IMAGE_OPS["Erosion-3x3-Square"](img))
