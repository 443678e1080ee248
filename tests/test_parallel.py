"""Multi-device tests on the 8-way virtual CPU mesh: the sharded halo-exchange
path must be bit-identical to the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dip_benchmark_tpu import oracle, spec
from dip_benchmark_tpu.parallel import (exchange_row_halo, make_mesh,
                                        sharded_fused_pipeline, sharded_op)


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


def _planar(img: np.ndarray) -> np.ndarray:
    return np.transpose(img, (2, 0, 1))  # (C, H, W)


def test_exchange_row_halo_matches_mirror_pad(devices_ok, gradient_image):
    """Sharded halo assembly == global mirror pad, including edge shards."""
    mesh = make_mesh(n_space=8)
    x = _planar(gradient_image)  # (3, 24, 40) -> 3 rows per shard
    halo = 2

    fn = jax.jit(jax.shard_map(
        lambda s: exchange_row_halo(s, halo),
        mesh=mesh,
        in_specs=jax.sharding.PartitionSpec(None, "space", None),
        out_specs=jax.sharding.PartitionSpec(None, "space", None)))
    got = np.asarray(fn(x))  # (3, 8*(3+2*halo), W)

    h_loc = x.shape[1] // 8
    ref_global = np.transpose(
        oracle.mirror_pad(gradient_image, halo, 0), (2, 0, 1))
    for s in range(8):
        shard = got[:, s * (h_loc + 2 * halo):(s + 1) * (h_loc + 2 * halo)]
        ref = ref_global[:, s * h_loc:s * h_loc + h_loc + 2 * halo]
        np.testing.assert_array_equal(shard, ref, err_msg=f"shard {s}")


def test_sharded_erosion_bit_exact(devices_ok, gradient_image):
    """A windowed op lifted with sharded_op == single-device oracle."""
    from dip_benchmark_tpu.ops import xla

    mesh = make_mesh(n_space=8)

    def local_erode(xp):  # (C, h+2, W) -> (C, h, W)
        hwc = jnp.transpose(xp, (1, 2, 0))
        padded = xla.mirror_pad(hwc, 0, 1)  # cols only; rows pre-exchanged
        out = jax.lax.reduce_window(
            padded, np.uint8(255), jax.lax.min,
            (3, 3, 1), (1, 1, 1), "VALID")
        return jnp.transpose(out, (2, 0, 1))

    op = sharded_op(local_erode, mesh, halo=1)
    got = np.asarray(op(_planar(gradient_image)))
    ref = _planar(oracle.erosion(gradient_image, spec.SQUARE_MASK_3X3))
    np.testing.assert_array_equal(got, ref)


def test_sharded_fused_pipeline_bit_exact(devices_ok, gradient_image):
    mesh = make_mesh(n_space=4, n_data=2)
    batch = np.stack([gradient_image, gradient_image[::-1].copy()])
    planar = np.transpose(batch, (0, 3, 1, 2))  # (B, C, H, W)
    apply = sharded_fused_pipeline(mesh)
    got = np.asarray(apply(planar))
    for b in range(2):
        ref = _planar(oracle.fused_pipeline(batch[b]))
        np.testing.assert_array_equal(got[b], ref, err_msg=f"batch {b}")


def test_refresh_resident_halo_matches_exchange(devices_ok, gradient_image):
    """The resident halo refresh writes exactly the rows exchange_row_halo
    would attach: ppermute strips from neighbors, global mirror on edge
    shards — verified strip-by-strip on the 8-way mesh."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dip_benchmark_tpu.parallel import make_mesh
    from dip_benchmark_tpu.parallel.halo import (exchange_row_halo,
                                                 refresh_resident_halo)

    mesh = make_mesh(n_space=8)
    h, w, py = 24, 40, 2
    planar = np.transpose(gradient_image[:h, :w], (2, 0, 1))
    h_loc = h // 8
    hp = h_loc + 2 * py + 3  # valid rows at [py, py+h_loc) + slack

    # resident buffers with GARBAGE halo rows (the refresh must fix them)
    blocks = []
    for i in range(8):
        blk = np.full((3, hp, w), 77, np.uint8)
        blk[:, py:py + h_loc] = planar[:, i * h_loc:(i + 1) * h_loc]
        blocks.append(blk)
    resident = np.concatenate(blocks, axis=1)

    fn = jax.jit(jax.shard_map(
        lambda b: refresh_resident_halo(b, py, h_loc),
        mesh=mesh, in_specs=P(None, "space", None),
        out_specs=P(None, "space", None)))
    ref = jax.jit(jax.shard_map(
        lambda x: exchange_row_halo(x, py),
        mesh=mesh, in_specs=P(None, "space", None),
        out_specs=P(None, "space", None)))

    out = np.asarray(fn(jax.device_put(
        resident, NamedSharding(mesh, P(None, "space", None)))))
    want = np.asarray(ref(jax.device_put(
        planar, NamedSharding(mesh, P(None, "space", None)))))
    # want: per shard (h_loc + 2*py) rows [top halo | valid | bottom halo]
    for i in range(8):
        blk = out[:, i * hp:(i + 1) * hp]
        wnt = want[:, i * (h_loc + 2 * py):(i + 1) * (h_loc + 2 * py)]
        np.testing.assert_array_equal(blk[:, :py], wnt[:, :py],
                                      err_msg=f"top halo shard {i}")
        np.testing.assert_array_equal(
            blk[:, py + h_loc:py + h_loc + py],
            wnt[:, py + h_loc:py + h_loc + py],
            err_msg=f"bottom halo shard {i}")
        np.testing.assert_array_equal(blk[:, py:py + h_loc],
                                      wnt[:, py:py + h_loc],
                                      err_msg=f"valid rows shard {i}")


def test_refresh_resident_cols_matches_bake(gradient_image):
    """The column-halo refresh reproduces exactly the columns
    to_resident_planar bakes: scramble every column-halo cell of a fresh
    resident buffer (all rows, halo rows included), refresh, and the
    buffer must bit-match the original bake across the whole read window
    [0, width + 2*pad_x) — rows' valid columns are the only surviving
    source, which is the per-application invariant the resident model
    maintains. Pure local (no mesh): columns are never sharded."""
    from dip_benchmark_tpu.parallel.halo import refresh_resident_cols
    from dip_benchmark_tpu.utils.image import (make_layout,
                                               to_resident_planar)

    n, h, w = 4, 24, 40
    planar = np.transpose(gradient_image[:h, :w], (2, 0, 1))
    layout = make_layout(h // n, w)
    baked = to_resident_planar(planar, layout, n)
    px = layout.pad_x
    scrambled = baked.copy()
    scrambled[..., :px] = 201
    scrambled[..., px + w:2 * px + w] = 202
    out = np.asarray(refresh_resident_cols(
        jnp.asarray(scrambled), px, w))
    np.testing.assert_array_equal(out[..., :2 * px + w],
                                  baked[..., :2 * px + w])
    # slack columns beyond the halo are untouched (never read by kernels)
    np.testing.assert_array_equal(out[..., 2 * px + w:],
                                  baked[..., 2 * px + w:])


def test_refresh_resident_cols_batched_rank():
    """refresh_resident_cols is rank-generic: a (B, C, Hp, Wp) stack gets
    the same per-image column re-mirror as each image refreshed alone."""
    from dip_benchmark_tpu.parallel.halo import refresh_resident_cols

    r = np.random.default_rng(4)
    px, w = 2, 20
    stack = r.integers(0, 256, (3, 2, 11, w + 2 * px + 4), np.uint8)
    got = np.asarray(refresh_resident_cols(jnp.asarray(stack), px, w))
    for b in range(3):
        one = np.asarray(refresh_resident_cols(
            jnp.asarray(stack[b]), px, w))
        np.testing.assert_array_equal(got[b], one, err_msg=f"batch {b}")
