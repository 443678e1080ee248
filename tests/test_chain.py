"""Generic fused op chains (models/chain.py) must match running the ops
sequentially — each sequential step re-applying the oracle to the previous
step's uint8 output with fresh mirror borders. Pallas interpret mode on
CPU (conftest)."""

import jax
import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.models.chain import make_fused_chain
from dip_benchmark_tpu.utils.image import (from_planar_padded, make_layout,
                                           to_planar_padded)

CHAINS = [
    # (cols, layout halo — None = default 2; deeper chains need
    #  halo >= total radius, see models/chain.py docstring)
    # the flagship config, via the generic builder
    (["Grayscale", "Threshold", "Erosion-3x3-Square",
      "Gaussian-Blur-3x3"], None),
    # per-channel point + dense conv
    (["Inversion", "Convolution-3x3"], None),
    # separated conv stages (per-pass quantization) + plus-shape erosion
    (["Convolution-1x5+5x1", "Erosion-3x3-Cross"], 3),
    # long mixed chain (total radius 2+1+1 = 4)
    (["Convolution-5x5", "Convolution-3x3", "Erosion-3x3-Square",
      "Threshold"], 4),
    # the two alias ops map to their exact equivalents
    (["Erosion-1x3+3x1-Square", "Copy"], None),
    # grayscale-first with a separated conv after it
    (["Grayscale", "Convolution-1x3+3x1"], None),
]


def run_chain(cols, image, halo=None):
    kw = {"halo": halo} if halo else {}
    layout = make_layout(*image.shape[:2], **kw)
    planar = jax.device_put(to_planar_padded(image, layout))
    out = np.asarray(make_fused_chain(layout, cols)(planar))
    return from_planar_padded(out, layout)


def sequential(cols, image):
    for col in cols:
        image = oracle.IMAGE_OPS[col](image)
    return image


@pytest.mark.parametrize("cols,halo", CHAINS, ids=lambda c: (
    "+".join(c) if isinstance(c, list) else str(c)))
def test_chain_matches_sequential_oracle(cols, halo, small_image):
    np.testing.assert_array_equal(run_chain(cols, small_image, halo),
                                  sequential(cols, small_image))


def test_chain_matches_sequential_oracle_gradient(gradient_image):
    cols = ["Convolution-3x3", "Erosion-3x3-Square", "Inversion"]
    np.testing.assert_array_equal(run_chain(cols, gradient_image),
                                  sequential(cols, gradient_image))


def test_chain_radius_budget_enforced(small_image):
    layout = make_layout(*small_image.shape[:2])
    with pytest.raises(ValueError, match="chain radius"):
        make_fused_chain(layout, ["Convolution-5x5"] * 5)  # ry = 10 > 8


def test_chain_grayscale_only_first(small_image):
    layout = make_layout(*small_image.shape[:2])
    with pytest.raises(ValueError, match="Grayscale"):
        make_fused_chain(layout, ["Inversion", "Grayscale"])


def test_chain_rejects_memory_ops(small_image):
    layout = make_layout(*small_image.shape[:2])
    with pytest.raises(ValueError, match="not fusable"):
        make_fused_chain(layout, ["Upload"])


def test_cli_fuse_row(small_image, tmp_path):
    """--fuse adds a verified Fused Chain row and dumps its image; a chain
    whose radius exceeds the default halo gets a deeper-halo rebake."""
    import os
    import subprocess
    import sys

    from dip_benchmark_tpu.utils.image import save_image
    img_path = tmp_path / "in.png"
    save_image(str(img_path), small_image)
    env = dict(os.environ, JAX_PLATFORMS="cpu", DIP_FORCE_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, "benchmarks/tpu/benchmark.py", str(img_path),
         str(tmp_path / "out"), "--rounds", "1", "--backend", "cpu",
         "--verify", "--fuse", "Convolution-5x5,Inversion,Convolution-3x3"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "Fused Chain (Conv5x5+Inversion+Conv3x3)" in proc.stdout
    assert (tmp_path / "out" / "chain-in.png").exists()

    bad = subprocess.run(
        [sys.executable, "benchmarks/tpu/benchmark.py", str(img_path),
         str(tmp_path / "out"), "--rounds", "1", "--backend", "cpu",
         "--fuse", "Inversion,Grayscale"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert bad.returncode == 2
    assert "Grayscale" in bad.stderr


def test_chain_fuzz_random_sequences(rng):
    """Fuzz: random op sequences (random length/ops, optional leading
    Grayscale, radius-bounded) must match sequential oracle application —
    exercises arbitrary packed/i32-island/gray-first compositions the
    fixed CHAINS list misses. Seeded via the shared rng fixture."""
    from dip_benchmark_tpu.models.chain import chain_radius

    pool = ["Copy", "Inversion", "Threshold", "Erosion-3x3-Cross",
            "Erosion-3x3-Square", "Erosion-1x3+3x1-Square",
            "Convolution-3x3", "Convolution-1x3+3x1", "Convolution-5x5",
            "Convolution-1x5+5x1", "Gaussian-Blur-3x3"]
    image = rng.integers(0, 256, size=(21, 33, 3), dtype=np.uint8)
    tested = 0
    for trial in range(40):
        n = int(rng.integers(1, 6))
        cols = [pool[int(i)] for i in rng.integers(0, len(pool), size=n)]
        if rng.integers(0, 2):
            cols = ["Grayscale"] + cols
        ry, rx = chain_radius(cols)
        if max(ry, rx) > 8:
            continue
        tested += 1
        np.testing.assert_array_equal(
            run_chain(cols, image, halo=max(2, ry, rx)),
            sequential(cols, image), err_msg=f"chain {cols}")
        if tested >= 12:  # bound suite time; 12 random chains per run
            break
    assert tested >= 8


def test_chain_max_radius_composes(small_image):
    """Total radius exactly at the DMA-window budget (8): four 5x5 convs
    on a halo=8 layout."""
    cols = ["Convolution-5x5"] * 4
    np.testing.assert_array_equal(run_chain(cols, small_image, halo=8),
                                  sequential(cols, small_image))


# ---------------------------------------------------------------------------
# Round 3: f32-model fused chains (make_fused_chain_f32)
# ---------------------------------------------------------------------------

def _seq_f32(img, cols):
    from dip_benchmark_tpu import oracle_f32
    x = oracle_f32.from_uint8_hwc(img)
    for c in cols:
        x = oracle_f32.IMAGE_OPS_F32[c](x)
    return oracle_f32.to_uint8_hwc(x)


@pytest.mark.parametrize("cols,halo", [
    (["Grayscale", "Threshold", "Erosion-3x3-Square",
      "Gaussian-Blur-3x3"], 2),
    (["Inversion", "Convolution-5x5"], 2),
    (["Convolution-1x3+3x1", "Erosion-3x3-Cross"], 2),
    (["Convolution-5x5", "Convolution-1x5+5x1"], 4),
])
def test_f32_chain_matches_sequential_oracle(cols, halo, small_image):
    from dip_benchmark_tpu import oracle_f32
    from dip_benchmark_tpu.models.chain import make_fused_chain_f32
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_planar_padded_f32)
    h, w, _ = small_image.shape
    layout = make_layout(h, w, halo=halo)
    fn = make_fused_chain_f32(layout, cols)
    out = np.asarray(fn(jax.device_put(
        to_planar_padded_f32(small_image, layout))))
    py, px = layout.pad_y, layout.pad_x
    got = oracle_f32.to_uint8_hwc(out[:, py:py + h, px:px + w])
    want = _seq_f32(small_image, cols)
    np.testing.assert_allclose(got.astype(int), want.astype(int), atol=1,
                               err_msg=str(cols))


def test_f32_chain_batched(small_image):
    from dip_benchmark_tpu import oracle_f32
    from dip_benchmark_tpu.models.chain import make_fused_chain_f32
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_planar_padded_f32)
    r = np.random.default_rng(3)
    h, w, _ = small_image.shape
    stack = r.integers(0, 256, (3, h, w, 3), np.uint8)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Cross"]
    layout = make_layout(h, w)
    fn = make_fused_chain_f32(layout, cols, batch=3)
    dev = np.stack([to_planar_padded_f32(im, layout) for im in stack])
    out = np.asarray(fn(jax.device_put(dev)))
    py, px = layout.pad_y, layout.pad_x
    for i in range(3):
        got = oracle_f32.to_uint8_hwc(out[i][:, py:py + h, px:px + w])
        np.testing.assert_allclose(got.astype(int),
                                   _seq_f32(stack[i], cols).astype(int),
                                   atol=1, err_msg=f"image {i}")


def test_f32_session_chain_operation(small_image):
    from dip_benchmark_tpu.session import BenchmarkSession
    session = BenchmarkSession(small_image, path="pallas", dtype="float32")
    cols = ["Inversion", "Convolution-3x3", "Convolution-5x5"]  # radius 3
    op = session.chain_operation(cols)
    op.run()
    got = op.fetch()
    want = session.oracle_ops()[op.csv_column](small_image)
    np.testing.assert_allclose(got.astype(int), want.astype(int),
                               atol=session.verify_atol)
    # chains appear in the f32 exec table too
    rows = session.execution_table(k1=2, k2=4, samples=1)
    assert rows[-1][0] == "Fused-Chain"


def test_f32_chain_fuzz_random_sequences(rng):
    """Fuzz the f32 chain compiler like the uint8 fuzzer: random op
    sequences vs the sequential f32 oracle (atol 1 after quantization)."""
    from dip_benchmark_tpu.models.chain import chain_radius, make_fused_chain_f32
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_planar_padded_f32)
    from dip_benchmark_tpu import oracle_f32
    pool = ["Copy", "Inversion", "Threshold", "Erosion-3x3-Cross",
            "Erosion-3x3-Square", "Erosion-1x3+3x1-Square",
            "Convolution-3x3", "Convolution-1x3+3x1", "Convolution-5x5",
            "Convolution-1x5+5x1", "Gaussian-Blur-3x3"]
    h, w = 40, 48
    img = rng.integers(0, 256, (h, w, 3), np.uint8)
    for trial in range(6):
        n = int(rng.integers(1, 5))
        cols = [pool[int(i)] for i in rng.integers(0, len(pool), n)]
        if rng.integers(0, 2):
            cols = ["Grayscale"] + cols
        ry, rx = chain_radius(cols)
        if max(ry, rx) > 8:
            continue
        layout = make_layout(h, w, halo=max(2, ry, rx))
        fn = make_fused_chain_f32(layout, cols)
        out = np.asarray(fn(jax.device_put(
            to_planar_padded_f32(img, layout))))
        py, px = layout.pad_y, layout.pad_x
        got = oracle_f32.to_uint8_hwc(out[:, py:py + h, px:px + w])
        want = _seq_f32(img, cols)
        np.testing.assert_allclose(got.astype(int), want.astype(int),
                                   atol=1, err_msg=f"trial {trial}: {cols}")


def test_fused_effective_band_published_geometry_unchanged():
    """At the benchmark-image geometry the fused-kernel budget cap keeps
    the layout band — hardware-validated configs are untouched."""
    from dip_benchmark_tpu.utils import image as im
    lo = im.make_layout(1024, 3504)
    assert im.fused_effective_band(lo, channels=3) == lo.band
    assert im.fused_effective_band(lo, channels=1) == lo.band


def test_fused_effective_band_caps_and_fits(monkeypatch):
    from dip_benchmark_tpu.utils import image as im
    lo = im.make_layout(1024, 3504)
    monkeypatch.setattr(
        im, "VMEM_BUDGET", im.fused_vmem_bytes(lo, lo.band, channels=3) - 1)
    b = im.fused_effective_band(lo, channels=3)
    assert b < lo.band and lo.banded_height % b == 0 and b % 8 == 0
    assert im.fused_vmem_bytes(lo, b, channels=3) <= im.VMEM_BUDGET


@pytest.mark.parametrize("cols", [
    ["Grayscale", "Threshold", "Erosion-3x3-Square"],  # gray-first packed
    ["Inversion", "Convolution-3x3"],                  # per-channel
])
def test_chain_exact_at_capped_band(monkeypatch, cols):
    """A budget-shrunk band must stay bit-exact (the cap changes tiling
    only, not semantics)."""
    from dip_benchmark_tpu.utils import image as im
    rng = np.random.default_rng(67)
    image = rng.integers(0, 256, size=(48, 200, 3), dtype=np.uint8)
    layout = make_layout(48, 200)
    full = im.fused_effective_band(layout, channels=3)
    monkeypatch.setattr(
        im, "VMEM_BUDGET",
        im.fused_vmem_bytes(layout, full, channels=3) - 1)
    assert im.fused_effective_band(layout, channels=3) < full
    planar = jax.device_put(to_planar_padded(image, layout))
    out = np.asarray(make_fused_chain(layout, cols)(planar))
    np.testing.assert_array_equal(from_planar_padded(out, layout),
                                  sequential(cols, image))


def test_pipeline_exact_at_capped_band(monkeypatch):
    from dip_benchmark_tpu.models.pipeline import make_fused_pipeline_pallas
    from dip_benchmark_tpu.utils import image as im
    rng = np.random.default_rng(68)
    image = rng.integers(0, 256, size=(48, 200, 3), dtype=np.uint8)
    layout = make_layout(48, 200)
    full = im.fused_effective_band(layout, channels=3)
    monkeypatch.setattr(
        im, "VMEM_BUDGET",
        im.fused_vmem_bytes(layout, full, channels=3) - 1)
    assert im.fused_effective_band(layout, channels=3) < full
    planar = jax.device_put(to_planar_padded(image, layout))
    out = np.asarray(make_fused_pipeline_pallas(layout)(planar))
    np.testing.assert_array_equal(from_planar_padded(out, layout),
                                  oracle.fused_pipeline(image))


def test_f32_chain_band_budget_capped(monkeypatch, small_image):
    """Round-5 review: the f32 fused chain budget-caps its halved band
    like the f32 pipeline and the uint8 chain (a wide f32 fused body
    otherwise models past the measured Mosaic acceptance boundary), and
    a capped band stays exact."""
    from dip_benchmark_tpu import oracle_f32
    from dip_benchmark_tpu.models.chain import make_fused_chain_f32
    from dip_benchmark_tpu.ops.pallas.window import _divisor_band
    from dip_benchmark_tpu.utils import image as im
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_planar_padded_f32)
    h, w, _ = small_image.shape
    layout = make_layout(h, w)
    start = _divisor_band(layout, 2)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Square"]
    monkeypatch.setattr(
        im, "VMEM_BUDGET",
        im.fused_vmem_bytes(layout, start, itemsize=4, channels=3) - 1)
    b = im.fused_effective_band(layout, itemsize=4, channels=3,
                                start=start)
    assert b < start and layout.banded_height % b == 0
    fn = make_fused_chain_f32(layout, cols)
    out = np.asarray(fn(jax.device_put(
        to_planar_padded_f32(small_image, layout))))
    py, px = layout.pad_y, layout.pad_x
    got = oracle_f32.to_uint8_hwc(out[:, py:py + h, px:px + w])
    np.testing.assert_allclose(got.astype(int),
                               _seq_f32(small_image, cols).astype(int),
                               atol=1)


def test_fused_effective_band_refuses_when_min_band_over_budget(monkeypatch):
    """When even the 8-row band models over budget, refuse with remedy
    text instead of silently handing Mosaic an over-budget body
    (round-5 review)."""
    from dip_benchmark_tpu.utils import image as im
    lo = im.make_layout(1024, 3504)
    monkeypatch.setattr(
        im, "VMEM_BUDGET",
        im.fused_vmem_bytes(lo, 8, itemsize=4, channels=3) - 1)
    with pytest.raises(ValueError, match="outside the VMEM envelope"):
        im.fused_effective_band(lo, itemsize=4, channels=3)
