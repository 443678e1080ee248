"""Multi-chip spatial parallelism: shard_map row-band sharding with
ppermute halo exchange over ICI.

The reference is strictly single-device (SURVEY.md §2.2 'parallelism
strategies'); its only scaling axis is the intra-kernel pixel grid. This
module is the TPU-native extension seam SURVEY.md §5 calls for: images are
sharded into row bands across a mesh axis, windowed ops exchange their halo
rows with neighbor devices via lax.ppermute (riding ICI), and the global
mirror border is applied only on the edge shards — so a sharded windowed op
is bit-identical to the single-device op.

Layouts here are planar (C, H, W) uint8 with H sharded; batched entry points
add a leading batch dim sharded over a data axis, giving the 2-D
(data, space) mesh used by dryrun_multichip.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import spec


def make_mesh(n_space: int, n_data: int = 1) -> Mesh:
    devs = np.array(jax.devices()[:n_space * n_data]).reshape(
        n_data, n_space)
    return Mesh(devs, ("data", "space"))


def _mirror_rows_low(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    # global rows -halo..-1 map to halo..1 (spec.mirror_index low: -i -> i)
    return jnp.flip(x[:, 1:halo + 1], axis=1)


def _mirror_rows_high(x: jnp.ndarray, halo: int) -> jnp.ndarray:
    # global rows H..H+halo-1 map to H-1..H-halo (high: 2n-i-1)
    return jnp.flip(x[:, -halo:], axis=1)


def exchange_row_halo(x: jnp.ndarray, halo: int,
                      axis_name: str = "space") -> jnp.ndarray:
    """Extend a local (C, h_loc, W) shard to (C, h_loc + 2*halo, W) using
    neighbor rows over ICI (lax.ppermute) and the spec mirror rule on the
    global edges. Must be called inside shard_map over `axis_name`."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    if n == 1:
        top = _mirror_rows_low(x, halo)
        bot = _mirror_rows_high(x, halo)
        return jnp.concatenate([top, x, bot], axis=1)
    # my bottom rows -> next device's top halo; my top rows -> prev's bottom.
    from_prev = lax.ppermute(x[:, -halo:], axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    from_next = lax.ppermute(x[:, :halo], axis_name,
                             [(i + 1, i) for i in range(n - 1)])
    top = jnp.where(idx == 0, _mirror_rows_low(x, halo), from_prev)
    bot = jnp.where(idx == n - 1, _mirror_rows_high(x, halo), from_next)
    return jnp.concatenate([top, x, bot], axis=1)


def refresh_resident_halo(buf: jnp.ndarray, pad_y: int, h_loc: int,
                          axis_name: str = "space") -> jnp.ndarray:
    """Refresh the halo rows of a PADDED-RESIDENT shard buffer in place
    (via dynamic_update_slice): rows [0, pad_y) get the previous shard's
    bottom valid rows, rows [pad_y + h_loc, pad_y + h_loc + pad_y) the
    next shard's top valid rows, with the spec mirror rule on the global
    edges. Strips travel over ICI (lax.ppermute); only 2*pad_y rows move
    per application — vs the whole-shard concat+pad+slice of the
    non-resident lift, measured 2.5x slower per application at fundus
    size (benchmarks/tuning/sharded_resident_lab.py). Must be called
    inside shard_map over `axis_name`; valid rows live at
    [pad_y, pad_y + h_loc)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    valid = buf[:, pad_y:pad_y + h_loc]
    top_mirror = _mirror_rows_low(valid, pad_y)
    bot_mirror = _mirror_rows_high(valid, pad_y)
    if n == 1:
        top, bot = top_mirror, bot_mirror
    else:
        from_prev = lax.ppermute(valid[:, h_loc - pad_y:], axis_name,
                                 [(i, i + 1) for i in range(n - 1)])
        from_next = lax.ppermute(valid[:, :pad_y], axis_name,
                                 [(i + 1, i) for i in range(n - 1)])
        top = jnp.where(idx == 0, top_mirror, from_prev)
        bot = jnp.where(idx == n - 1, bot_mirror, from_next)
    buf = lax.dynamic_update_slice(buf, top, (0, 0, 0))
    return lax.dynamic_update_slice(buf, bot, (0, pad_y + h_loc, 0))


def refresh_resident_cols(buf: jnp.ndarray, pad_x: int,
                          width: int) -> jnp.ndarray:
    """Re-mirror the COLUMN halos of a padded(-resident) buffer from its
    valid columns: cols [0, pad_x) get flip(valid cols [1, pad_x]), cols
    [pad_x + width, pad_x + width + pad_x) get flip(the last pad_x valid
    cols) — spec.mirror_index applied over the full buffer height, so
    halo ROWS (already refreshed) get consistent corners too. Columns are
    never sharded, so unlike the row refresh this is purely local (no
    collective): two (..., Hp, pad_x) strips, a flip, and two lane-dim
    update-slices. Closes the round-3 column-drift asterisk: with this
    called each windowed application (after refresh_resident_halo),
    chained resident sharded applications are bit-exact for arbitrary
    depth — matching the single-device reference's per-dispatch border
    re-establishment (sycl/benchmark.cpp:341-356) on BOTH axes. Works on
    (C, Hp, Wp) buffers and (B, C, Hp, Wp) stacks alike."""
    left = jnp.flip(buf[..., pad_x + 1:2 * pad_x + 1], axis=-1)
    right = jnp.flip(buf[..., width:pad_x + width], axis=-1)
    buf = lax.dynamic_update_slice_in_dim(buf, left, 0, axis=-1)
    return lax.dynamic_update_slice_in_dim(buf, right, pad_x + width,
                                           axis=-1)


def sharded_op(local_fn, mesh: Mesh, halo: int):
    """Lift local_fn((C, h+2*halo, W) padded-rows shard) -> (C, h, W) into a
    global (C, H, W) -> (C, H, W) op over the mesh's space axis."""

    def shard_body(x):  # x: (C, h_loc, W)
        return local_fn(exchange_row_halo(x, halo))

    return jax.jit(jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=P(None, "space", None),
        out_specs=P(None, "space", None)))


def _pipeline_local(xp: jnp.ndarray) -> jnp.ndarray:
    """Local fused pipeline on a (C, h + 4, W) row-extended shard, in plain
    jnp (runs inside shard_map on any backend; the Pallas variant of this
    body lives in models.pipeline). Columns use the global mirror rule
    locally — correct because columns are not sharded."""
    from ..ops import xla

    hwc = jnp.transpose(xp, (1, 2, 0))  # (h+4, W, C)
    gray = xla.threshold(xla.grayscale(hwc))
    # erosion 3x3 square consuming one halo row each side; mirror cols
    g = xla.mirror_pad(gray, 0, 1)
    e = lax.reduce_window(g, np.uint8(255), lax.min, (3, 3, 1), (1, 1, 1),
                          "VALID")  # (h+2, W, C)
    b = xla.mirror_pad(e, 0, 1).astype(jnp.int32)
    acc = None
    m = spec.BLUR_3X3_INT
    hh, ww = e.shape[0] - 2, e.shape[1]
    for ky in range(3):
        for kx in range(3):
            t = int(m[ky, kx]) * lax.slice(
                b, (ky, kx, 0), (ky + hh, kx + ww, b.shape[2]))
            acc = t if acc is None else acc + t
    out = jnp.clip((acc + 8) >> 4, 0, 255).astype(jnp.uint8)
    return jnp.transpose(out, (2, 0, 1))


def sharded_fused_pipeline(mesh: Mesh):
    """The flagship fused pipeline sharded over a (data, space) mesh:
    batch dim over 'data', image rows over 'space', ppermute halo exchange
    for the two windowed stages. Input/output: (B, C, H, W) uint8."""

    def shard_body(x):  # x: (B_loc, C, h_loc, W)
        def one(img):
            return _pipeline_local(exchange_row_halo(img, 2))
        return jax.vmap(one)(x)

    fn = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=P("data", None, "space", None),
        out_specs=P("data", None, "space", None))

    jfn = jax.jit(fn)  # jit ONCE: a per-call wrapper re-pays dispatch setup

    def apply(batch: jax.Array) -> jax.Array:
        sharding = NamedSharding(mesh, P("data", None, "space", None))
        batch = jax.device_put(batch, sharding)
        return jfn(batch)

    return apply
