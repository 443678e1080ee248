"""Wide x sharded composition (parallel/wide.py): beyond-envelope widths
row-sharded across the virtual mesh — column strips per row shard, row
halos over ICI + column seams local, bit-exact vs the NumPy oracle.

Strip widths are forced tiny (LANE) so a small image exercises multiple
strips AND multiple row shards at once, in Pallas interpret mode on CPU.
"""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.parallel import make_mesh
from dip_benchmark_tpu.parallel import wide as swide
from dip_benchmark_tpu.utils.image import LANE


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def test_sharded_wide_round_trip(devices_ok):
    img = _img(32, 300, seed=5)
    mesh = make_mesh(n_space=4)
    wl = swide.make_sharded_wide_plan(32, 300, 4, strip_width=LANE)
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(img, wl, 4), mesh)
    assert all(s.sharding.spec == jax.sharding.PartitionSpec(
        None, "space", None) for s in strips)
    np.testing.assert_array_equal(
        swide.from_sharded_wide_resident(strips, wl, 4), img)


def test_sharded_wide_plan_validation():
    with pytest.raises(ValueError, match="divide height"):
        swide.make_sharded_wide_plan(30, 300, 4, strip_width=LANE)
    # The shard-size check must fire before make_wide_layout's own
    # min-dims guard so the user sees the actionable remedy.
    with pytest.raises(ValueError, match="use fewer devices"):
        swide.make_sharded_wide_plan(8, 300, 4, strip_width=LANE)


def test_sharded_wide_session_rejects_tiny_images(devices_ok):
    # below the 5x5 contract shared with WideBenchmarkSession
    with pytest.raises(ValueError, match="at least 5x5"):
        swide.ShardedWideBenchmarkSession(_img(4, 300), n_devices=1,
                                          strip_width=LANE)
    # tall enough for the contract but too short for 8 shards' mirror
    # padding: a named remedy, not a wrapped-slice nonsense error
    with pytest.raises(ValueError, match="use fewer devices"):
        swide.ShardedWideBenchmarkSession(_img(7, 300), n_devices=8,
                                          strip_width=LANE)


@pytest.mark.parametrize("col", [
    "Inversion", "Grayscale", "Copy",
    "Erosion-3x3-Cross", "Erosion-1x3+3x1-Square",
    "Convolution-3x3", "Convolution-5x5", "Convolution-1x5+5x1",
    "Gaussian-Blur-3x3", "Fused-Pipeline"])
def test_sharded_wide_ops_bit_exact(devices_ok, col):
    """3 strips x 4 row shards: interior + edge seams on BOTH axes."""
    img = _img(32, 300, seed=11)
    mesh = make_mesh(n_space=4)
    ops, wl = swide.build_sharded_wide_ops(mesh, 32, 300,
                                           strip_width=LANE)
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(img, wl, 4), mesh)
    got = swide.from_sharded_wide_resident(ops[col](strips), wl, 4)
    np.testing.assert_array_equal(got, oracle.IMAGE_OPS[col](img),
                                  err_msg=col)


@pytest.mark.parametrize("col,k", [("Erosion-3x3-Square", 4),
                                   ("Convolution-5x5", 3)])
def test_sharded_wide_composition_arbitrary_depth(devices_ok, col, k):
    """The resident contract on BOTH axes at once: repeated applications
    stay bit-exact far past the pad budget (row halos re-ppermute, column
    seams re-copy, every application)."""
    img = _img(24, 280, seed=13)
    mesh = make_mesh(n_space=4)
    ops, wl = swide.build_sharded_wide_ops(mesh, 24, 280, strip_width=LANE)
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(img, wl, 4), mesh)
    want = img
    for _ in range(k):
        strips = ops[col](strips)
        want = oracle.IMAGE_OPS[col](want)
    np.testing.assert_array_equal(
        swide.from_sharded_wide_resident(strips, wl, 4), want)


def test_sharded_wide_mixed_chain_composes(devices_ok):
    """Point and windowed ops interleave through the resident state."""
    img = _img(16, 280, seed=17)
    mesh = make_mesh(n_space=2)
    ops, wl = swide.build_sharded_wide_ops(mesh, 16, 280, axis="space",
                                           strip_width=LANE)
    cols = ["Inversion", "Erosion-3x3-Cross", "Threshold",
            "Gaussian-Blur-3x3"]
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(img, wl, 2), mesh)
    want = img
    for c in cols:
        strips = ops[c](strips)
        want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(
        swide.from_sharded_wide_resident(strips, wl, 2), want)


def test_sharded_wide_f32(devices_ok):
    from dip_benchmark_tpu import oracle_f32
    img = _img(16, 280, seed=19)
    mesh = make_mesh(n_space=4)
    ops, wl = swide.build_sharded_wide_ops(mesh, 16, 280, dtype="float32",
                                           strip_width=LANE)
    assert wl.itemsize == 4
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident_f32(img, wl, 4), mesh)
    got = swide.from_sharded_wide_resident_f32(
        ops["Gaussian-Blur-3x3"](strips), wl, 4)
    want = oracle_f32.IMAGE_OPS_F32["Gaussian-Blur-3x3"](
        oracle_f32.from_uint8_hwc(img))
    np.testing.assert_allclose(got, want, rtol=0, atol=3e-7)


def test_sharded_wide_matches_unsharded_wide(devices_ok):
    """n=1 sharded-wide == the plain wide model (degenerate composition)."""
    from dip_benchmark_tpu.models import wide as wide_mod
    img = _img(16, 280, seed=23)
    mesh = make_mesh(n_space=1)
    ops, wl = swide.build_sharded_wide_ops(mesh, 16, 280, strip_width=LANE)
    strips = swide.put_sharded_wide(
        swide.to_sharded_wide_resident(img, wl, 1), mesh)
    got = swide.from_sharded_wide_resident(
        ops["Convolution-5x5"](strips), wl, 1)

    uwl = wide_mod.make_wide_layout(16, 280, strip_width=LANE)
    ustrips = wide_mod.put_wide(wide_mod.to_wide_resident(img, uwl))
    want = wide_mod.from_wide_resident(
        wide_mod.build_wide_ops(uwl)["Convolution-5x5"](ustrips), uwl)
    np.testing.assert_array_equal(got, want)


# -- the benchmark-session surface (ShardedWideBenchmarkSession) ------------


def test_sharded_wide_session_end_to_end(devices_ok, tmp_path):
    """The full 14-op contract (+ pipeline) over the sharded-wide model:
    height 30 over 4 shards exercises the mirror row padding (pad 2),
    every row verifies bit-exact vs the oracle through the runner."""
    from dip_benchmark_tpu.harness import BenchmarkRunner
    from dip_benchmark_tpu.parallel.wide import ShardedWideBenchmarkSession
    img = _img(30, 300, seed=31)
    s = ShardedWideBenchmarkSession(img, n_devices=4, strip_width=LANE)
    assert s.wl.n_strips >= 2 and s.valid_height == 30
    runner = BenchmarkRunner(s.operations(include_pipeline=True), rounds=2)
    results = runner.run(filename="sw.png", outdir=str(tmp_path),
                         verify_against=img, verify_ops=s.oracle_ops(),
                         verify_atol=s.verify_atol, quiet=True)
    assert len(results) == 15
    assert (tmp_path / "inversion-sw.png").exists()


def test_sharded_wide_session_f32(devices_ok, tmp_path):
    from dip_benchmark_tpu.harness import BenchmarkRunner
    from dip_benchmark_tpu.parallel.wide import ShardedWideBenchmarkSession
    img = _img(28, 290, seed=37)
    s = ShardedWideBenchmarkSession(img, n_devices=4, dtype="float32",
                                    strip_width=LANE)
    runner = BenchmarkRunner(s.operations(), rounds=1)
    results = runner.run(filename="sw.png", outdir=str(tmp_path),
                         verify_against=img, verify_ops=s.oracle_ops(),
                         verify_atol=s.verify_atol, quiet=True)
    assert len(results) == 14


def test_sharded_wide_session_chain_within_halo(devices_ok):
    """--fuse, radius <= halo: one fused kernel per strip per shard on
    the session's own residents, bit-exact vs the sequential oracle."""
    from dip_benchmark_tpu.parallel.wide import ShardedWideBenchmarkSession
    img = _img(32, 300, seed=41)
    s = ShardedWideBenchmarkSession(img, n_devices=4, strip_width=LANE)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Square"]
    op = s.chain_operation(cols)
    op.run()
    want = img
    for c in cols:
        want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(op.fetch(), want)
    assert op.csv_column in s.oracle_ops()  # verify path wired
    rows = s.execution_table(k1=1, k2=2, samples=1)
    assert rows[-1][0] == "Fused-Chain"


def test_sharded_wide_session_chain_deep_halo(devices_ok):
    """--fuse past the session halo: deeper-halo plan + re-bake, with the
    row padding re-grown to cover the chain radius (30 rows over 4
    shards: pad 2 -> radius 4 forces pad 6)."""
    from dip_benchmark_tpu.parallel.wide import ShardedWideBenchmarkSession
    img = _img(30, 300, seed=43)
    s = ShardedWideBenchmarkSession(img, n_devices=4, strip_width=LANE)
    cols = ["Convolution-5x5", "Convolution-3x3"]  # ry = rx = 3 > halo 2
    op = s.chain_operation(cols)
    op.run()
    want = img
    for c in cols:
        want = oracle.IMAGE_OPS[c](want)
    np.testing.assert_array_equal(op.fetch(), want)


def test_sharded_wide_session_warm_and_chained(devices_ok):
    """aot.warm admits the session (_ops + strips_dev) and the chained-K
    table carries the strip pytree through the shard_map programs."""
    from dip_benchmark_tpu.parallel.wide import ShardedWideBenchmarkSession
    from dip_benchmark_tpu.runtime.aot import warm
    img = _img(16, 280, seed=47)
    s = ShardedWideBenchmarkSession(img, n_devices=2, strip_width=LANE)
    compiled = warm(s)
    assert "Convolution-5x5" in compiled
    ops = s.chained_operations(2)
    row = next(o for o in ops if o.csv_column == "Erosion-3x3-Square")
    assert row.time_scale == 2
    row.run()  # two in-graph applications execute


def test_cli_sharded_wide_route(devices_ok, tmp_path, monkeypatch, capsys):
    """--shards + beyond-envelope width routes to the sharded-wide
    session (round-5: was an explicit refusal) and runs green."""
    from dip_benchmark_tpu import cli
    from dip_benchmark_tpu.utils import image as image_mod
    from dip_benchmark_tpu.utils.image import save_image
    orig = image_mod.fit_band

    def fake(width, halo=image_mod.DEFAULT_HALO, itemsize=1, cap=112):
        return 0 if width > 200 else orig(width, halo, itemsize, cap)
    monkeypatch.setattr(image_mod, "fit_band", fake)
    img = _img(24, 300, seed=53)
    path = tmp_path / "wide.png"
    save_image(str(path), img)
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--shards", "2", "--verify"])
    assert rc == 0
    assert "sharded-wide model" in capsys.readouterr().err
    # --chained reaches the sharded-wide route (round-5 review: the
    # blanket --shards guard made the implemented surface unreachable)
    rc = cli.main([str(path), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--shards", "2", "--chained", "2"])
    assert rc == 0
    # ... while the plain sharded session (no chained surface) still
    # rejects it with the gated message
    narrow = tmp_path / "narrow.png"
    save_image(str(narrow), _img(24, 64, seed=54))
    rc = cli.main([str(narrow), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--shards", "2", "--chained", "2"])
    assert rc == 2
    assert "sharded-wide route" in capsys.readouterr().err
    # a session-construction contract failure exits 2 with remedy text
    # instead of a raw traceback (7 rows can't pad to 8 shards)
    short = tmp_path / "short.png"
    save_image(str(short), _img(7, 300, seed=55))
    rc = cli.main([str(short), str(tmp_path / "out"), "--rounds", "1",
                   "--backend", "cpu", "--shards", "8"])
    assert rc == 2
    assert "use fewer devices" in capsys.readouterr().err
