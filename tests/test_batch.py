"""Batch processing tests: vmapped ops match per-image oracle outputs."""

import os

import numpy as np
import pytest

from dip_benchmark_tpu import oracle
from dip_benchmark_tpu.models import batch
from dip_benchmark_tpu.parallel import make_mesh
from dip_benchmark_tpu.utils.image import load_image, save_image


def test_process_batch_matches_oracle(rng):
    imgs = rng.integers(0, 256, size=(3, 16, 24, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, "Inversion")
    for i in range(3):
        np.testing.assert_array_equal(out[i], oracle.inversion(imgs[i]))


def test_process_batch_pipeline_routes_to_pallas(rng, monkeypatch):
    """process_batch('Fused-Pipeline') takes the batched Pallas kernel
    (asserted via dispatch spy) and still matches the per-image oracle."""
    calls = []
    real = batch._batched_pipeline
    monkeypatch.setattr(batch, "_batched_pipeline",
                        lambda layout, b: (calls.append(b), real(layout, b))[1])
    imgs = rng.integers(0, 256, size=(3, 24, 40, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, "Fused-Pipeline")
    assert calls == [3], "Fused-Pipeline did not route to the Pallas path"
    for b in range(3):
        np.testing.assert_array_equal(
            out[b], oracle.IMAGE_OPS["Fused-Pipeline"](imgs[b]))


def test_batched_pallas_pipeline_matches_oracle(rng):
    """The serving path: fused pipeline over a (B, C, Hp, Wp) stack in one
    Pallas dispatch (leading batch grid dim)."""
    import jax
    from dip_benchmark_tpu.models.pipeline import make_fused_pipeline_pallas
    from dip_benchmark_tpu.utils.image import make_layout, to_planar_padded

    imgs = rng.integers(0, 256, size=(3, 24, 40, 3), dtype=np.uint8)
    layout = make_layout(24, 40)
    stack = np.stack([to_planar_padded(im, layout) for im in imgs])
    out = np.asarray(make_fused_pipeline_pallas(layout, batch=3)(
        jax.device_put(stack)))
    py = layout.pad_y  # shape-preserving output: valid rows at pad_y
    for b in range(3):
        got = np.transpose(
            out[b][:, py:py + 24, layout.pad_x:layout.pad_x + 40], (1, 2, 0))
        np.testing.assert_array_equal(
            got, oracle.IMAGE_OPS["Fused-Pipeline"](imgs[b]))


def test_process_batch_sharded_over_data_axis(rng):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_space=1, n_data=8)
    imgs = rng.integers(0, 256, size=(8, 16, 24, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, "Fused-Pipeline", mesh=mesh)
    for i in range(8):
        np.testing.assert_array_equal(out[i], oracle.fused_pipeline(imgs[i]))


def test_process_directory_mixed_shapes(rng, tmp_path):
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    shapes = [(16, 24, 3), (16, 24, 3), (32, 40, 3)]
    imgs = {}
    for i, shape in enumerate(shapes):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        name = f"img{i}.png"
        save_image(str(indir / name), img)
        imgs[name] = img
    written = batch.process_directory(str(indir), str(outdir), "Threshold",
                                      batch_size=2)
    assert len(written) == 3
    for name, img in imgs.items():
        got = load_image(str(outdir / name))
        np.testing.assert_array_equal(got, oracle.threshold(img))


def test_process_batch_chain_matches_sequential_oracle(rng):
    """A LIST op runs the batched fused-chain kernel; outputs must match
    applying the oracle ops sequentially per image."""
    cols = ["Grayscale", "Threshold", "Convolution-3x3"]
    imgs = rng.integers(0, 256, size=(3, 24, 40, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, cols)
    for i in range(3):
        want = imgs[i]
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(out[i], want)


def test_process_batch_chain_deep_halo(rng):
    """A radius-4 chain gets its deeper-halo layout automatically."""
    cols = ["Convolution-5x5", "Convolution-5x5"]
    imgs = rng.integers(0, 256, size=(2, 24, 40, 3), dtype=np.uint8)
    out = batch.process_batch(imgs, cols)
    for i in range(2):
        want = imgs[i]
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(out[i], want)


def test_process_directory_chain_op(rng, tmp_path):
    indir, outdir = tmp_path / "in", tmp_path / "out"
    indir.mkdir()
    imgs = {}
    for i in range(3):
        img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
        save_image(str(indir / f"img{i}.png"), img)
        imgs[f"img{i}.png"] = img
    cols = ["Inversion", "Erosion-3x3-Square"]
    written = batch.process_directory(str(indir), str(outdir), cols,
                                      batch_size=2)
    assert len(written) == 3
    for name, img in imgs.items():
        want = oracle.IMAGE_OPS["Erosion-3x3-Square"](
            oracle.IMAGE_OPS["Inversion"](img))
        np.testing.assert_array_equal(load_image(str(outdir / name)), want)


def test_process_directory_overlaps_dispatch_and_fetch(rng, tmp_path,
                                                      monkeypatch):
    """The serving overlap: chunk N+1 must be DISPATCHED before chunk N is
    fetched (so device compute overlaps host encode of the previous
    chunk). Spy on the dispatch/fetch sequence with 3 same-shape chunks."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    for i in range(3):
        save_image(str(indir / f"img{i}.png"),
                   rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8))

    events = []
    real_dispatch, real_fetch = batch._dispatch_batch, batch._fetch_batch

    def spy_dispatch(images, col, mesh):
        events.append(("dispatch", len(images)))
        return real_dispatch(images, col, mesh)

    def spy_fetch(token):
        events.append(("fetch",))
        return real_fetch(token)

    monkeypatch.setattr(batch, "_dispatch_batch", spy_dispatch)
    monkeypatch.setattr(batch, "_fetch_batch", spy_fetch)
    written = batch.process_directory(str(indir), str(outdir), "Inversion",
                                      batch_size=1)
    assert len(written) == 3
    assert events == [("dispatch", 1), ("dispatch", 1), ("fetch",),
                      ("dispatch", 1), ("fetch",), ("fetch",)]


# ---------------------------------------------------------------------------
# Round 3: batched sharded chains on the 2-D mesh (batch tool surface)
# ---------------------------------------------------------------------------

def test_process_batch_sharded_chain_2d_mesh(rng):
    """Chains over a (data, space) mesh: odd batch (pads over data) and
    non-divisible height (mirror-pads rows) both crop back bit-exactly."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_space=4, n_data=2)
    imgs = rng.integers(0, 256, size=(3, 27, 31, 3), dtype=np.uint8)
    cols = ["Grayscale", "Threshold", "Erosion-3x3-Square"]
    got = batch.process_batch(imgs, cols, mesh=mesh)
    for i in range(3):
        want = imgs[i]
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(got[i], want, err_msg=f"img {i}")


def test_process_batch_sharded_pipeline_routes_to_chain(rng):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_space=4, n_data=2)
    imgs = rng.integers(0, 256, size=(2, 32, 28, 3), dtype=np.uint8)
    got = batch.process_batch(imgs, "Fused-Pipeline", mesh=mesh)
    for i in range(2):
        np.testing.assert_array_equal(
            got[i], oracle.IMAGE_OPS["Fused-Pipeline"](imgs[i]))


def test_process_directory_sharded_chain(rng, tmp_path):
    """The VERDICT-r2 'done' criterion: a --op chain directory run sharded
    over the virtual mesh, bit-exact per image."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    indir, outdir = tmp_path / "in", tmp_path / "out"
    os.makedirs(indir)
    cols = ["Inversion", "Convolution-3x3"]
    imgs = {}
    for i in range(3):
        img = rng.integers(0, 256, size=(26, 30, 3), dtype=np.uint8)
        imgs[f"im{i}.png"] = img
        save_image(str(indir / f"im{i}.png"), img)
    mesh = make_mesh(n_space=4, n_data=2)
    written = batch.process_directory(str(indir), str(outdir), cols,
                                      batch_size=2, mesh=mesh)
    assert len(written) == 3
    for name, img in imgs.items():
        want = img
        for c in cols:
            want = oracle.IMAGE_OPS[c](want)
        np.testing.assert_array_equal(load_image(str(outdir / name)), want,
                                      err_msg=name)


def test_process_directory_header_decode_shape_mismatch(rng, tmp_path,
                                                        monkeypatch):
    """cv2 applies EXIF orientation at decode; the PIL header probe does
    not — a portrait shot can decode transposed vs its group key. The
    chunk regroups by DECODED shape instead of crashing np.stack
    (round-5 review)."""
    indir = tmp_path / "in"
    outdir = tmp_path / "out"
    indir.mkdir()
    a = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    save_image(str(indir / "a.png"), a)
    save_image(str(indir / "b.png"), b)
    real = batch.load_image
    bt = np.ascontiguousarray(b.transpose(1, 0, 2))

    def fake(path):
        # the decoder applied an orientation the header probe didn't see
        return bt if path.endswith("b.png") else real(path)

    monkeypatch.setattr(batch, "load_image", fake)
    written = batch.process_directory(str(indir), str(outdir), "Inversion",
                                      batch_size=2)
    assert len(written) == 2
    np.testing.assert_array_equal(load_image(str(outdir / "a.png")),
                                  oracle.inversion(a))
    np.testing.assert_array_equal(load_image(str(outdir / "b.png")),
                                  oracle.inversion(bt))
