"""Distributed benchmark session: the op table over a device mesh.

Runs the same 14-op contract with the image row-sharded across devices:
Upload scatters the host image to all shards (H2D + layout), Copy/compute
ops run as shard_map programs with ICI halo exchange, Download gathers.
Memory-op payloads therefore measure the full multi-device path (scatter /
gather / cross-shard copies), a capability the single-device reference has
no counterpart for (SURVEY.md §2.2 'distributed communication backend').
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import spec
from ..harness import Operation
from ..session import aot_wrap
from .halo import make_mesh
from .ops import build_sharded_ops


def _sync(x):
    return jax.block_until_ready(x)


class ShardedBenchmarkSession:
    """Op table over a (space=n,) mesh; image rows padded to shard evenly.

    path: "xla" lifts plain jnp/lax bodies over the mesh (parallel/ops.py);
    "pallas" lifts the hand-written P-path kernels themselves, each shard
    running them on its locally assembled planar buffer with ICI halo
    exchange (parallel/pallas_ops.py). Both bit-exact vs the oracle.

    dtype: "uint8" (primary HWC model) or "float32" (the CUDA.jl-parity
    planar [0,1] model, SURVEY.md §2.3) — the same sharding scheme lifts
    both models' op sets; outputs verify against the matching oracle
    (f32 within the single-device session's 1-level quantization atol)."""

    def __init__(self, host_image: np.ndarray, n_devices: int | None = None,
                 mesh: Mesh | None = None, path: str = "xla",
                 dtype: str = "uint8"):
        from ..utils.image import check_uint8_hwc
        check_uint8_hwc(host_image)
        if min(host_image.shape[:2]) < 5:
            # Same contract as BenchmarkSession: narrower images break
            # the 5x5 ops' column mirrors opaquely (or silently on the
            # clipped Pallas path).
            raise ValueError(
                f"image must be at least 5x5 for the 5x5 convolution ops, "
                f"got {host_image.shape[0]}x{host_image.shape[1]}")
        if dtype not in ("uint8", "float32"):
            raise ValueError(f"Unknown dtype: {dtype!r}")
        self.mesh = mesh or make_mesh(n_space=n_devices
                                      or len(jax.devices()))
        n = self.mesh.shape["space"]
        h, w, c = host_image.shape
        self.path = path
        self.dtype = dtype
        self.width = w
        # Pad rows (high-side mirror: row h+k holds img[h-1-k]) so H divides
        # the shard count; crop on fetch. Keep pad >= 2 so windowed taps up
        # to 2 rows past the valid region read real mirror values (not the
        # halo-exchange's mirror-of-the-padded-edge), preserving bit-exact
        # borders; pad == 1 would break a 5x5 tap at the last valid row.
        pad = (-h) % n
        if pad == 1:
            pad += n
        self.valid_height = h
        img = host_image
        if pad:
            extra = img[h - pad:][::-1]
            img = np.concatenate([img, extra], axis=0)
        planar = np.transpose(img, (2, 0, 1))  # (C, Hs, W)
        if planar.shape[1] // n < 3:
            raise ValueError(
                f"{planar.shape[1]} rows over {n} shards leaves "
                f"{planar.shape[1] // n} rows per shard; halo exchange "
                f"needs >= 3 — use fewer devices or a taller image")
        # Upload transfers the UNPADDED image bytes (the benchmark payload,
        # comparable across paths; the f32 model's payload is its native
        # f32 planar bytes, like the CUDA.jl backend's upload of the host-
        # converted Float32 array, cuda/benchmark.jl:171-173); the pallas
        # path's lane-padded compute buffer is built on device from it,
        # untimed (same role as the single-device session's layout build).
        if dtype == "float32":
            planar = planar.astype(np.float32) / np.float32(255)
        self.host_planar = np.ascontiguousarray(planar)
        self.sharding = NamedSharding(self.mesh, P(None, "space", None))
        if path == "pallas":
            from ..utils.image import to_resident_planar
            from .pallas_ops import build_sharded_pallas_ops
            self._ops, self.layout = build_sharded_pallas_ops(
                self.mesh, planar.shape[1], w, dtype=dtype)
            # PADDED-RESIDENT device model (round 3): each shard stores
            # its full padded local layout, so ops pay only the halo-strip
            # refresh per application (parallel/pallas_ops.py docstring).
            dev_buf = to_resident_planar(planar, self.layout, n)
        elif path == "xla":
            if dtype == "float32":
                from .ops import build_sharded_ops_f32
                self._ops = build_sharded_ops_f32(self.mesh)
            else:
                self._ops = build_sharded_ops(self.mesh)
            self.layout = None
            dev_buf = self.host_planar
        else:
            raise ValueError(f"Unknown path: {path!r} (want pallas|xla)")
        self.n_shards = n
        self.h_loc = planar.shape[1] // n
        self.planar_dev = _sync(jax.device_put(dev_buf, self.sharding))
        self._sample = None
        self._extra_oracles: dict = {}
        self._chain_exec: tuple | None = None  # set by chain_operation
        self._chunked_dl = None  # built lazily (Download's 'once' column)

    # -- memory ops ---------------------------------------------------------

    def _upload(self):
        return _sync(jax.device_put(self.host_planar, self.sharding))

    def _download(self):
        if self._chunked_dl is None:
            from ..runtime.transfer import make_chunked_download
            crop = None
            if self.layout is not None:
                # extract valid rows + crop lane padding on DEVICE so the
                # timed D2H moves the image bytes, comparable with the
                # xla path's row (resident model: valid rows sit at
                # [pad_y, pad_y + h_loc) of each shard's padded block)
                py, px = self.layout.pad_y, self.layout.pad_x
                hp, vw = self.layout.padded_height, self.width
                n, hl = self.n_shards, self.h_loc

                def crop(x):
                    c, total, wp = x.shape
                    blocks = x.reshape(c, n, hp, wp)
                    valid = blocks[:, :, py:py + hl]
                    return valid.reshape(c, n * hl, wp)[:, :, px:px + vw]
            self._chunked_dl = make_chunked_download(
                self.planar_dev, crop, axis=1)
        return self._chunked_dl()

    def _download_prepare(self):
        np.asarray(_sync(jax.device_put(
            np.zeros((1, self.mesh.shape["space"], 128), np.uint8),
            self.sharding)))

    # -- table --------------------------------------------------------------

    def _make_run(self, fn):
        src = self.planar_dev
        op = aot_wrap(self, fn)

        def run():
            self._sample = _sync(op(src))
        return run

    def _fetch(self) -> np.ndarray:
        if self.layout is not None:  # pallas path: resident model
            from ..utils.image import from_resident_planar
            arr = from_resident_planar(
                np.asarray(self._sample), self.layout, self.n_shards,
                self.h_loc, height=self.valid_height)
        else:
            arr = np.asarray(self._sample)[:, :self.valid_height]
        if self.dtype == "float32":
            from .. import oracle_f32
            return oracle_f32.to_uint8_hwc(arr)
        return np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))

    def operations(self, include_pipeline: bool = False) -> list[Operation]:
        ops: list[Operation] = []
        for desc, prefix, col in spec.OPERATION_MATRIX:
            if col == "Upload":
                ops.append(Operation(desc, prefix, col, self._upload,
                                     self._fetch))
            elif col == "Download":
                ops.append(Operation(desc, prefix, col, self._download,
                                     self._fetch,
                                     prepare=self._download_prepare,
                                     downloads=True))
            else:
                ops.append(Operation(desc, prefix, col,
                                     self._make_run(self._ops[col]),
                                     self._fetch))
        if include_pipeline:
            ops.append(Operation(
                "Fused Pipeline (Grayscale+Threshold+Erosion+Blur)",
                "pipeline", "Fused-Pipeline",
                self._make_run(self._ops["Fused-Pipeline"]), self._fetch))
        return ops

    def chain_operation(self, cols: list[str]) -> Operation:
        """--fuse row for the sharded session (pallas path only): the
        chain runs via sharded_pallas_chain — one fused kernel per shard,
        ppermute halo sized to the chain's total radius. The chain gets
        its OWN row padding (untimed session state): the bottom shard's
        halo-exchange mirror reflects the PADDED edge, so baked mirror
        rows must cover the chain's vertical radius (the session's
        'pad >= 2' rule generalized to pad >= ry, or pad == 0 where the
        padded edge IS the true image edge)."""
        if self.path != "pallas":
            raise ValueError("--fuse with --shards needs --path pallas")
        from ..models.chain import check_chain
        from ..utils.image import to_resident_planar
        from .pallas_ops import sharded_pallas_chain

        ry, rx = check_chain(cols)
        n = self.mesh.shape["space"]
        h = self.valid_height
        base = self.host_planar[:, :h]
        # sharded_pallas_chain's layout halo is max(2, ry, rx); padding
        # and shard-height growth must use the SAME bound or its
        # thin-shard check can fire after we promised auto-padding
        need = max(ry, rx, 2)
        pad = (-h) % n
        # grow until (a) baked mirror rows cover the chain's vertical
        # radius (or the padded edge IS the true edge) and (b) shards are
        # tall enough for the radius-`need` halo exchange
        while (0 < pad < need) or (h + pad) // n < need + 1:
            pad += n
        if pad > h:
            raise ValueError(
                f"image of {h} rows is too small for a chain needing "
                f"{need}-row halos (ry={ry}, rx={rx}) over {n} shards")
        planar = (base if pad == 0 else np.concatenate(
            [base, base[:, h - pad:][:, ::-1]], axis=1))
        fn, layout = sharded_pallas_chain(self.mesh, cols,
                                          planar.shape[1], self.width,
                                          dtype=self.dtype)
        # resident model at the CHAIN's halo (chain layouts have pad_y =
        # max(2, ry, rx), so the chain gets its own resident buffer)
        dev = _sync(jax.device_put(
            to_resident_planar(planar, layout, n), self.sharding))
        # expose to execution_table (sharded chains are shape-preserving)
        self._chain_exec = (fn, dev)
        op = aot_wrap(self, fn)
        h_loc = planar.shape[1] // n

        def run():
            self._sample = _sync(op(dev))

        def fetch():
            from ..utils.image import from_resident_planar
            arr = from_resident_planar(np.asarray(self._sample), layout,
                                       n, h_loc, height=h)
            if self.dtype == "float32":
                from .. import oracle_f32
                return oracle_f32.to_uint8_hwc(arr)
            return np.ascontiguousarray(np.transpose(arr, (1, 2, 0)))

        from ..models.chain import chain_row_parts
        desc, col, seq_oracle = chain_row_parts(cols, dtype=self.dtype)
        self._extra_oracles[col] = seq_oracle
        return Operation(desc, "chain", col, run, fetch)

    def execution_table(self, include_pipeline: bool = False,
                        k1: int = 30, k2: int = 300,
                        samples: int = 5,
                        auto_scale: bool = False) -> list[tuple[str, float]]:
        """[(csv_column, seconds_per_application)] of TRUE device execution
        time for the SHARDED ops — the chained-K marginal lifted over the
        shard_map programs. Every sharded op is shape-preserving on the
        global (C, H, Wp) array, so `lax.fori_loop` composes them in-graph
        (each iteration re-runs halo exchange + kernels on every shard);
        fetching one element at the end forces completion of the whole
        chain, ICI collectives included — so the marginal prices the full
        per-application cost of the distributed op, which the dispatch-rate
        rows cannot see on relay rigs (runtime/exec_timing.py docstring).

        D2H-bearing: run AFTER the regular measurements, like the
        single-device table."""
        from ..runtime.exec_timing import execution_time
        src = self.planar_dev
        cols = [c for _, _, c in spec.OPERATION_MATRIX
                if c not in ("Upload", "Download")]
        if include_pipeline:
            cols.append("Fused-Pipeline")
        # Shape preservation DETECTED, not assumed (session.py's rule): a
        # future shape-changing sharded op gets a clear error instead of
        # an opaque fori_loop carry mismatch inside execution_time.
        banded = [col for col in cols
                  if jax.eval_shape(self._ops[col], src).shape != src.shape]
        if banded:
            raise ValueError(
                f"the sharded exec table requires shape-preserving ops; "
                f"{banded} change the device-layout shape")
        rows = [(col, execution_time(self._ops[col], src,
                                     k1=k1, k2=k2, samples=samples,
                                     auto_scale=auto_scale))
                for col in cols]
        if self._chain_exec is not None:
            fn, dev = self._chain_exec
            rows.append(("Fused-Chain", execution_time(
                fn, dev, k1=k1, k2=k2, samples=samples,
                auto_scale=auto_scale)))
        return rows

    @property
    def verify_atol(self) -> int:
        # uint8: bit-exact contract; f32: 1 quantization level of ulp slack
        # (same rationale as BenchmarkSession.verify_atol).
        return 1 if self.dtype == "float32" else 0

    def oracle_ops(self) -> dict:
        if self.dtype == "float32":
            from .. import oracle_f32
            base = oracle_f32.uint8_verify_ops()
            if self._extra_oracles:  # chain rows' sequential f32 oracles
                base = {**base, **self._extra_oracles}
            return base
        from .. import native, oracle
        base = (native.image_ops() if native.available()
                else oracle.IMAGE_OPS)
        if self._extra_oracles:
            base = {**base, **self._extra_oracles}
        return base
