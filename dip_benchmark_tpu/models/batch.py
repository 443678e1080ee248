"""Batch image processing: vmapped ops over image stacks and directories.

A production-serving extension beyond the single-image reference benchmark:
apply any op of the matrix (or the fused pipeline) to a batch of same-sized
images in one dispatch — vmapped on one device, or sharded over a mesh's
data axis for multi-chip throughput (composes with parallel.halo's space
axis; see sharded_fused_pipeline for the 2-D mesh variant).
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import numpy as np

from ..ops import xla
from ..utils.image import is_image_file, load_image, save_image


@functools.lru_cache(maxsize=None)
def batch_op(csv_column):
    """Jitted (B, H, W, C) uint8 -> (B, H, W, C) op (X-path, vmapped).
    A tuple of columns composes the ops sequentially in one jitted program
    (XLA fuses the chain). Cached: jax.jit's compile cache is keyed by
    function identity, so a fresh wrapper per directory chunk would
    retrace+recompile every chunk — synchronous host work that would
    defeat the dispatch/fetch overlap."""
    if isinstance(csv_column, tuple):
        fns = [xla.IMAGE_OPS[c] for c in csv_column]

        def chain_fn(im):
            for f in fns:
                im = f(im)
            return im
        return jax.jit(jax.vmap(chain_fn))
    fn = xla.IMAGE_OPS[csv_column]
    return jax.jit(jax.vmap(fn))


@functools.lru_cache(maxsize=None)
def _batched_pipeline(layout, b: int):
    """Cached (PlanarLayout is frozen/hashable): rebuilding the kernel per
    process_batch call would pay trace + Mosaic lowering + XLA compile for
    every chunk of a directory run."""
    from .pipeline import make_fused_pipeline_pallas
    return make_fused_pipeline_pallas(layout, batch=b)


@functools.lru_cache(maxsize=None)
def _batched_chain(layout, cols: tuple[str, ...], b: int):
    from .chain import make_fused_chain
    return make_fused_chain(layout, list(cols), batch=b)


PIPELINE_COLS = ("Grayscale", "Threshold", "Erosion-3x3-Square",
                 "Gaussian-Blur-3x3")  # the flagship pipeline as a chain


@functools.lru_cache(maxsize=None)
def _sharded_chain(mesh, cols: tuple[str, ...], height: int, width: int,
                   batch: int):
    """Cached (Mesh/PlanarLayout are hashable): the jitted 2-D-mesh
    batched chain + its per-shard layout, one compile per geometry."""
    from ..parallel.pallas_ops import sharded_pallas_chain
    return sharded_pallas_chain(mesh, list(cols), height, width,
                                batch=batch)


def _dispatch_sharded_chain(images: np.ndarray, cols: tuple[str, ...],
                            mesh: jax.sharding.Mesh):
    """Batched fused chain over the FULL 2-D (data, space) mesh: batch
    shards over 'data', image rows over 'space' with chain-radius halo
    exchange, each shard running the batched chain kernel
    (parallel/pallas_ops.sharded_pallas_chain(batch=...)). Rows are
    mirror-padded so shards divide evenly and carry the chain's halo
    (the parallel/session.py padding rule); the batch is padded to the
    data-axis size by repeating the last image (cropped on fetch)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .chain import check_chain
    b, h, w, _ = images.shape
    n_space = mesh.shape["space"]
    n_data = mesh.shape["data"]
    ry, rx = check_chain(list(cols))
    need = max(ry, rx, 2)
    pad = (-h) % n_space
    while (0 < pad < need) or (h + pad) // n_space < need + 1:
        pad += n_space
    if pad > h:
        raise ValueError(
            f"{h}-row images are too small for a chain needing {need}-row "
            f"halos over {n_space} row shards")
    bpad = (-b) % n_data
    stack = images
    if bpad:
        stack = np.concatenate(
            [stack, np.repeat(stack[-1:], bpad, axis=0)], axis=0)
    if pad:
        stack = np.concatenate(
            [stack, stack[:, h - pad:][:, ::-1]], axis=1)
    planar = np.transpose(stack, (0, 3, 1, 2))  # (Bp, C, Hs, W)
    fn, layout = _sharded_chain(mesh, cols, h + pad, w, b + bpad)
    from ..utils.image import to_resident_planar
    baked = to_resident_planar(planar, layout, n_space)
    sharding = NamedSharding(mesh, P("data", None, "space", None))
    out = fn(jax.device_put(baked, sharding))
    return ("sharded", layout, (h, w, b, n_space, (h + pad) // n_space),
            out)


def _dispatch_batch(images: np.ndarray, csv_column,
                    mesh: jax.sharding.Mesh | None):
    """Enqueue one batch asynchronously; returns an opaque token for
    _fetch_batch. JAX dispatch is async, so the caller can overlap host
    work (fetch/encode of the previous batch, decode of the next) with
    this batch's device execution. csv_column may be a LIST of columns:
    the whole op chain then runs as one batched fused kernel
    (models/chain.py) — single dispatch, single HBM round-trip per image.
    With a 2-D mesh, chains (and the flagship pipeline, which IS the
    PIPELINE_COLS chain) run sharded across chips."""
    if mesh is not None and (isinstance(csv_column, (list, tuple))
                             or csv_column == "Fused-Pipeline"):
        cols = (PIPELINE_COLS if csv_column == "Fused-Pipeline"
                else tuple(csv_column))
        return _dispatch_sharded_chain(images, cols, mesh)
    if mesh is None and (isinstance(csv_column, (list, tuple))
                         or csv_column == "Fused-Pipeline"):
        # Natively batched Pallas kernel (leading batch grid dim, ~79-100
        # us/image on a v5e vs the ~2 ms vmapped X-path flat-domain
        # pipeline — the interleaved HWC model's price, see ops/xla.py).
        from ..utils.image import make_layout, to_planar_padded
        b, h, w, _ = images.shape
        if isinstance(csv_column, (list, tuple)):
            from .chain import check_chain
            cols = tuple(csv_column)
            halo = max(2, max(check_chain(list(cols))))
            layout = make_layout(h, w, halo=halo)
            kernel = _batched_chain(layout, cols, b)
        else:
            layout = make_layout(h, w)
            kernel = _batched_pipeline(layout, b)
        stack = np.stack([to_planar_padded(im, layout) for im in images])
        return ("pallas", layout, (h, w), kernel(jax.device_put(stack)))
    op = batch_op(csv_column)
    x = images
    if mesh is not None:
        sharding = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        x = jax.device_put(x, sharding)
    return ("xla", None, None, op(x))


def _fetch_batch(token) -> np.ndarray:
    """Force completion of a _dispatch_batch token and return the uint8
    (B, H, W, C) result."""
    kind, layout, hw, out = token
    out = np.asarray(jax.block_until_ready(out))
    if kind == "xla":
        return out
    if kind == "sharded":
        # resident stacks: extract each shard block's valid rows, crop
        # batch/row padding + lane cols (utils.image.from_resident_planar)
        from ..utils.image import from_resident_planar
        h, w, b, n_space, h_loc = hw
        valid = from_resident_planar(out, layout, n_space, h_loc,
                                     height=h)[:b]
        return np.ascontiguousarray(np.transpose(valid, (0, 2, 3, 1)))
    # shape-preserving output: image row 0 sits at padded row pad_y
    h, w = hw
    py = layout.pad_y
    valid = out[:, :, py:py + h, layout.pad_x:layout.pad_x + w]
    return np.ascontiguousarray(np.transpose(valid, (0, 2, 3, 1)))


def process_batch(images: np.ndarray, csv_column="Fused-Pipeline",
                  mesh: jax.sharding.Mesh | None = None) -> np.ndarray:
    """Run one op — or, given a LIST of columns, a fused op chain — over a
    uint8 (B, H, W, C) stack; optionally shard the batch dim over mesh
    axis 'data'. Single-device Fused-Pipeline and chains take batched
    Pallas kernels; everything else is the vmapped X-path."""
    return _fetch_batch(_dispatch_batch(images, csv_column, mesh))


def process_directory(indir: str, outdir: str,
                      csv_column="Fused-Pipeline",
                      batch_size: int = 8,
                      mesh: jax.sharding.Mesh | None = None) -> list[str]:
    """Process every image in `indir`, grouping same-shaped images into
    batched dispatches. Returns the written paths.

    Serving-style overlap: each chunk is DISPATCHED asynchronously, and
    the previous chunk is fetched + encoded while the current one executes
    on-device — host JPEG/PNG work and device compute pipeline instead of
    strictly alternating (one chunk of latency hidden per chunk)."""
    os.makedirs(outdir, exist_ok=True)

    def probe_shape(path: str) -> tuple:
        # Group by shape WITHOUT decoding: holding a whole directory of
        # decoded images before the first dispatch bounds nothing. PIL
        # reads dimensions from the header; load_image always yields RGB
        # HWC, so channels are 3 regardless of the file's mode.
        try:
            from PIL import Image
            with Image.open(path) as im:
                w, h = im.size
            return (h, w, 3)
        except Exception:
            return load_image(path).shape

    by_shape: dict[tuple, list[tuple[str, str]]] = {}
    for name in sorted(os.listdir(indir)):
        path = os.path.join(indir, name)
        if not is_image_file(path):
            continue
        by_shape.setdefault(probe_shape(path), []).append((name, path))

    written = []
    pending: tuple[list, tuple] | None = None  # (chunk names, token)

    def drain(p):
        chunk, token = p
        for (name, _), result in zip(chunk, _fetch_batch(token)):
            dst = os.path.join(outdir, name)
            save_image(dst, result)
            written.append(dst)

    for _, items in by_shape.items():
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            # Decode per chunk: memory stays ~2 chunks (this stack + the
            # pending fetch), and decode overlaps the previous chunk's
            # device execution just like the encode side. The header
            # probe can disagree with the decoded shape (cv2 applies
            # EXIF orientation; the header doesn't), so regroup by the
            # ACTUAL decoded shape before stacking — a transposed
            # portrait shot becomes its own sub-batch instead of a
            # np.stack crash.
            decoded: dict[tuple, list[tuple[str, np.ndarray]]] = {}
            for name, p in chunk:
                im = load_image(p)
                decoded.setdefault(im.shape, []).append((name, im))
            for group in decoded.values():
                stack = np.stack([im for _, im in group])
                token = _dispatch_batch(stack, csv_column, mesh=mesh)
                if pending is not None:
                    drain(pending)
                pending = (group, token)
    if pending is not None:
        drain(pending)
    return written


def main(argv: list[str] | None = None) -> int:
    import argparse

    from .. import spec
    from ..runtime.cache import enable_compilation_cache
    enable_compilation_cache()
    cols = [c for c in spec.CSV_COLUMNS if c not in ("Upload", "Download")]
    cols.append("Fused-Pipeline")
    p = argparse.ArgumentParser(
        description="Batch-apply a DIP op (or a fused op chain) to every "
                    "image in a directory")
    p.add_argument("indir")
    p.add_argument("outdir")
    p.add_argument("--op", default="Fused-Pipeline", metavar="OP[,OP...]",
                   help=f"one of {', '.join(cols)}, or a comma-separated "
                        "chain of device ops fused into one batched kernel "
                        "(models/chain.py rules apply)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--shards", type=int, default=0, metavar="N",
                   help="Shard image rows over N devices (chain/pipeline "
                        "ops only: the batched fused kernel then runs on "
                        "a (data, space) mesh with ppermute halo exchange)")
    p.add_argument("--data-shards", type=int, default=1, metavar="D",
                   help="Also shard the batch dim over D devices (needs "
                        "--shards; total devices = N*D)")
    p.add_argument("--backend", choices=["tpu", "cpu", "any"], default="any",
                   help="Device backend gate (cpu forces the host platform "
                        "even under a sitecustomize-registered accelerator)")
    args = p.parse_args(argv)

    from ..runtime.device import DeviceGateError, gate_backend
    try:
        gate_backend(args.backend)
    except DeviceGateError as e:
        print(str(e), file=sys.stderr)
        return 4
    op = args.op
    if "," in op:
        op = [c.strip() for c in op.split(",") if c.strip()]
        try:  # validate the chain up front (fusability, order, radius)
            from .chain import check_chain
            check_chain(op)
        except (ValueError, AssertionError) as e:
            print(f"--op chain: {e}", file=sys.stderr)
            return 2
    elif op not in cols:
        print(f"--op must be one of {cols} or a comma-separated chain",
              file=sys.stderr)
        return 2
    mesh = None
    if args.shards:
        if not (isinstance(op, list) or op == "Fused-Pipeline"):
            print("--shards applies to chain/pipeline ops only",
                  file=sys.stderr)
            return 2
        from ..parallel.halo import make_mesh
        mesh = make_mesh(n_space=args.shards, n_data=args.data_shards)
    elif args.data_shards != 1:
        print("--data-shards needs --shards", file=sys.stderr)
        return 2
    written = process_directory(args.indir, args.outdir, op,
                                args.batch_size, mesh=mesh)
    print(f"Processed {len(written)} images -> {args.outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
