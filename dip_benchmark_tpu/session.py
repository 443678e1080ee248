"""Benchmark session: device state + the operations table for one image.

Owns the three device-boundary crossings of the reference design (SURVEY.md
§3.2): (a) initial upload of the working image (plus, for the Pallas path,
the planar mirror-padded layout build — the analogue of the reference's
host-side layout conversion and mask uploads, all untimed), (b) per-round
op dispatch (the measured quantity), (c) post-measurement download for the
image dump.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np

from . import spec
from .harness import Operation
from .ops import xla
from .utils import image as image_util


def _sync(x):
    return jax.block_until_ready(x)


class AotOp:
    """Self-upgrading op handle: the first call traces+compiles (so the
    benchmark's 'once' column includes compile cost, like every reference
    backend's JIT), and later calls invoke the compiled executable directly
    — measured ~16 us cheaper per dispatch than going through jax.jit's
    call path, which is significant in the dispatch-bound regime."""

    def __init__(self, jitted):
        self._jitted = jitted
        self._compiled = None

    def __call__(self, x):
        if self._compiled is None:
            self._compiled = self._jitted.lower(x).compile()
        return self._compiled(x)


def aot_wrap(session, fn):
    """Session-scoped AotOp cache: the same jitted fn maps to ONE AotOp
    across operations() calls, and runtime/aot.warm seeds the cache with
    the executables it just built — without it, the table's first timed
    call would re-lower and re-compile what warm() already compiled."""
    if not hasattr(fn, "lower"):
        return fn
    cache = getattr(session, "_aot_ops", None)
    if cache is None:
        cache = session._aot_ops = {}
    op = cache.get(id(fn))
    if op is None:
        op = cache[id(fn)] = AotOp(fn)
    return op


class BenchmarkSession:
    """Builds the 14-op table over a host image for one execution path.

    path: "xla" (jitted library calls) or "pallas" (hand-written kernels).
    dtype: "uint8" (primary HWC data model) or "float32" (the CUDA.jl-parity
    planar-CHW [0,1] model, SURVEY.md §2.3; supported on both paths).
    """

    def __init__(self, host_image: np.ndarray, path: str = "pallas",
                 device: jax.Device | None = None, dtype: str = "uint8"):
        image_util.check_uint8_hwc(host_image)
        if min(host_image.shape[:2]) < 5:
            raise ValueError(
                f"image must be at least 5x5 for the 5x5 convolution ops, "
                f"got {host_image.shape[0]}x{host_image.shape[1]}")
        self.host_image = np.ascontiguousarray(host_image)
        self.path = path
        self.dtype = dtype
        self.device = device or jax.devices()[0]
        self._sample: jax.Array | None = None
        self._extra_oracles: dict = {}
        self._chain_exec: tuple | None = None  # set by chain_operation
        if dtype not in ("uint8", "float32"):
            raise ValueError(f"Unknown dtype: {dtype!r}")

        # (a) initial upload — session state, untimed (the timed Upload op
        # re-does this transfer every round). The memory-op payload is the
        # data model's working buffer: uint8 HWC image bytes for the
        # primary model; the UNPADDED f32 planar for --dtype float32
        # (CUDA.jl uploads the host-converted Float32 array,
        # cuda/benchmark.jl:171-173) — matching the sharded session so the
        # two surfaces' Upload/Download rows are comparable.
        if dtype == "float32":
            from . import oracle_f32
            self._mem_host = oracle_f32.from_uint8_hwc(self.host_image)
            self.image_dev = None  # the u8 image is not device state here
            self._mem_dev = _sync(jax.device_put(self._mem_host,
                                                 self.device))
        else:
            self._mem_host = self.host_image
            self.image_dev = _sync(jax.device_put(self.host_image,
                                                  self.device))
            self._mem_dev = self.image_dev
        # NOTE: deliberately NO device->host transfer here — one D2H flips
        # tunneled PJRT rigs into a degraded mode that slows every later
        # dispatch ~500x, so all D2H is deferred to the harness's post-
        # measurement phase (see harness module docstring). The Download
        # operation carries its own prepare() warm-up instead.
        # Download must hand back FRESH device buffers every round: jax.Array
        # caches its host copy, so re-downloading self.image_dev would time a
        # no-op after round 1. The chunked reader's split program yields new
        # buffers each call (XLA may not alias a parameter to a result) and
        # pipelines the k chunk reads (runtime/transfer.py — measured 15%
        # under the single-read transport floor on the relay rig). Built
        # lazily: its compile belongs to Download's 'once' column.
        self._chunked_dl = None

        if path == "pallas" and dtype == "float32":
            from .ops import pallas as pallas_ops
            h, w, c = host_image.shape
            self.layout = image_util.make_layout(h, w, c, itemsize=4)
            planar_host = image_util.to_planar_padded_f32(self.host_image,
                                                          self.layout)
            self.planar_dev = _sync(jax.device_put(planar_host, self.device))
            self._ops_impl = pallas_ops.build_f32_ops(self.layout)
            self._crop = pallas_ops.build_f32_crops(self.layout)
        elif path == "pallas":
            from .ops import pallas as pallas_ops
            h, w, c = host_image.shape
            self.layout = image_util.make_layout(h, w, c)
            planar_host = image_util.to_planar_padded(self.host_image,
                                                      self.layout)
            self.planar_dev = _sync(jax.device_put(planar_host, self.device))
            self._ops_impl = pallas_ops.build_ops(self.layout)
            self._crop = pallas_ops.build_crops(self.layout)
        elif path == "xla" and dtype == "float32":
            from . import oracle_f32
            from .ops import xla_f32
            # the working buffer IS the f32 memory-op payload (above)
            self.planar_f32_dev = self._mem_dev
            self._ops_impl = {col: jax.jit(fn)
                              for col, fn in xla_f32.IMAGE_OPS_F32.items()}
            self._crop = {col: (lambda a: oracle_f32.to_uint8_hwc(
                np.asarray(a))) for col in xla_f32.IMAGE_OPS_F32}
        elif path == "xla":
            self._ops_impl = {col: jax.jit(fn)
                              for col, fn in xla.IMAGE_OPS.items()}
            self._crop = {col: lambda a: np.asarray(a)
                          for col in xla.IMAGE_OPS}
        else:
            raise ValueError(f"Unknown path: {path!r} (want pallas|xla)")

    # -- memory ops --------------------------------------------------------

    def _upload(self):
        return _sync(jax.device_put(self._mem_host, self.device))

    def _download(self):
        if self._chunked_dl is None:
            from .runtime.transfer import make_chunked_download
            # The f32 payload is planar (C, H, W): chunk along rows, not
            # the 3-plane leading axis, or the read pipeline clamps to 3
            # chunks (uint8 HWC splits rows at axis 0 already).
            self._chunked_dl = make_chunked_download(
                self._mem_dev, axis=1 if self.dtype == "float32" else 0)
        return self._chunked_dl()

    def _download_prepare(self):
        """Untimed warm-up absorbing one-time D2H transport initialization
        (~90 s of lazy relay setup on tunneled rigs) so the Download 'once'
        column shows transfer cost, not infrastructure setup — the context-
        creation analogue of the reference's device gates
        [cuda/benchmark.jl:276-279]."""
        np.asarray(_sync(jax.device_put(np.zeros((8, 128), np.uint8),
                                        self.device)))

    # -- table -------------------------------------------------------------

    def _device_input(self) -> jax.Array:
        if self.path == "pallas":
            return self.planar_dev
        if self.dtype == "float32":
            return self.planar_f32_dev
        return self.image_dev

    def _make_run(self, fn: Callable) -> Callable[[], None]:
        src = self._device_input()
        op = aot_wrap(self, fn)

        def run():
            self._sample = _sync(op(src))
        return run

    def operations(self, include_pipeline: bool = False) -> list[Operation]:
        ops: list[Operation] = []
        for desc, prefix, col in spec.OPERATION_MATRIX:
            if col == "Upload":
                ops.append(Operation(desc, prefix, col, self._upload,
                                     self._fetch_sample))
            elif col == "Download":
                ops.append(Operation(desc, prefix, col, self._download,
                                     self._fetch_sample,
                                     prepare=self._download_prepare,
                                     downloads=True))
            else:
                fn = self._ops_impl[col]
                crop = self._crop[col]
                run = self._make_run(fn)
                ops.append(Operation(
                    desc, prefix, col, run,
                    (lambda c=crop: c(self._sample))))
        if include_pipeline:
            ops.append(self.pipeline_operation())
        return ops

    def chained_operations(self, k: int,
                           include_pipeline: bool = False) -> list[Operation]:
        """Measurement-only table where each timed round executes k chained
        applications of the op inside ONE jitted program (lax.fori_loop) —
        reporting per-APPLICATION time with per-dispatch overhead amortized
        away. CAVEAT: rounds sync via block_until_ready, which on relay
        rigs acks enqueue without awaiting execution, so there this mode
        measures amortized SUBMISSION cost, not device work — use
        execution_table (--exec) for true execution time. Works on every
        path/model (since the round-2 shape-preserving scheme ALL device
        ops map their layout to themselves, so chains compose on each of
        the four surfaces); no image dumps (outputs are k-fold
        applications, not the benchmark contract's single application)."""
        from jax import lax

        ops: list[Operation] = []
        cols = [t for t in spec.OPERATION_MATRIX
                if t[2] not in ("Upload", "Download")]
        if include_pipeline:
            cols.append((
                "Fused Pipeline (Grayscale+Threshold+Erosion+Blur)", "",
                "Fused-Pipeline"))
        # Shape preservation is DETECTED, not assumed (like
        # execution_table's banded_cols): a future shape-changing op gets
        # a clear error here instead of an opaque fori_loop carry
        # mismatch at trace time.
        src = self._device_input()
        banded = [col for _, _, col in cols
                  if jax.eval_shape(self._ops_impl[col], src).shape
                  != src.shape]
        if banded:
            raise ValueError(
                f"--chained requires shape-preserving ops; {banded} "
                f"change the device-layout shape (use --exec, whose "
                f"banded chain re-inserts per iteration)")
        for desc, _prefix, col in cols:
            fn = self._ops_impl[col]
            chained = jax.jit(
                lambda x, fn=fn: lax.fori_loop(0, k, lambda i, v: fn(v), x))
            ops.append(Operation(desc, "", col, self._make_run(chained),
                                 self._fetch_sample, time_scale=k))
        return ops

    def execution_table(self, include_pipeline: bool = False,
                        k1: int = 30, k2: int = 300,
                        samples: int = 5,
                        auto_scale: bool = False) -> list[tuple[str, float]]:
        """[(csv_column, seconds_per_application)] of TRUE device execution
        time per op, via the chained-K marginal method (runtime/exec_timing
        docstring: on relay rigs block_until_ready acks enqueue, so the
        regular repeated column is a dispatch-rate number like the async
        reference backends'; this table is the completed-work number).

        D2H-bearing: run AFTER the regular measurements (the first D2H flips
        relay rigs into a degraded dispatch mode).
        """
        from .runtime.exec_timing import execution_time
        src = self._device_input()
        rows: list[tuple[str, float]] = []
        cols = [c for _, _, c in spec.OPERATION_MATRIX
                if c not in ("Upload", "Download")]
        if include_pipeline:
            cols.append("Fused-Pipeline")
        # An op whose output shape differs from its input cannot chain
        # directly; its chain re-inserts via dynamic_update_slice and gets
        # the Passthrough correction row. Since the round-2 shape-preserving
        # kernel scheme every op maps the padded layout to itself, so this
        # set is normally empty (detected, not assumed).
        banded_cols = {c for c in cols
                       if jax.eval_shape(self._ops_impl[c], src).shape
                       != src.shape}
        for col in cols:
            fn = self._ops_impl[col]
            t = execution_time(fn, src, banded=col in banded_cols,
                               k1=k1, k2=k2, samples=samples,
                               auto_scale=auto_scale)
            rows.append((col, t))
        if banded_cols:
            # Passthrough row: the banded chain's per-iteration re-insert
            # overhead alone (slice to a representative banded output shape
            # + the tile-aligned dynamic_update_slice), so readers can
            # subtract the chain-copy cost from banded rows
            # (runtime/exec_timing.py docstring).
            from jax import lax
            ref = next(c for c in cols if c in banded_cols)
            osd = jax.eval_shape(self._ops_impl[ref], src)

            def passthrough(v, shape=osd.shape, dt=osd.dtype):
                return lax.slice(
                    v, (0,) * v.ndim, shape).astype(dt)
            t = execution_time(passthrough, src, banded=True,
                               k1=k1, k2=k2, samples=samples,
                               auto_scale=auto_scale)
            rows.append(("Passthrough", t))
        if self._chain_exec is not None:
            fn, planar = self._chain_exec
            rows.append(("Fused-Chain", execution_time(
                fn, planar, k1=k1, k2=k2, samples=samples,
                auto_scale=auto_scale)))
        return rows

    def pipeline_operation(self) -> Operation:
        """Extra benchmark row: the flagship fused pipeline
        (grayscale -> threshold -> erosion 3x3 -> blur 3x3) as ONE dispatch —
        vs four dispatches if chained from the op table. Not part of the
        reference matrix, so it gets no CSV column (csv writers ignore it)."""
        fn = self._ops_impl["Fused-Pipeline"]
        crop = self._crop["Fused-Pipeline"]
        run = self._make_run(fn)
        return Operation(
            "Fused Pipeline (Grayscale+Threshold+Erosion+Blur)", "pipeline",
            "Fused-Pipeline", run, (lambda: crop(self._sample)))

    def chain_operation(self, cols: list[str]) -> Operation:
        """Extra benchmark row: an ARBITRARY fused op chain (models/chain
        .py) as ONE Pallas dispatch — the user-composable generalization of
        pipeline_operation. Pallas path; both data models (uint8 chains are
        packed-16 integer kernels, f32 chains the make_fused_chain_f32
        form). When the chain's total radius exceeds the session layout's
        halo, a deeper-halo layout + planar copy is built here (untimed
        session state, like the initial upload)."""
        if self.path != "pallas":
            raise ValueError("fused chains need --path pallas")
        from .models import chain as chain_model
        from .utils.image import from_planar_padded
        ry, rx = chain_model.check_chain(cols)
        r = max(ry, rx)
        f32 = self.dtype == "float32"
        to_planar = (image_util.to_planar_padded_f32 if f32
                     else image_util.to_planar_padded)
        if r <= self.layout.pad_y:
            layout, planar = self.layout, self.planar_dev
        else:
            h, w, c = self.host_image.shape
            if min(h, w) < r + 1:
                # spec.mirror_index (and the fused-vs-sequential mirror
                # induction) is only defined for offsets <= dim-1; a
                # deeper-halo bake on a shorter image would silently
                # diverge from the sequential oracle.
                raise ValueError(
                    f"image {h}x{w} is too small for a radius-{r} fused "
                    f"chain (mirror halo needs both dims >= {r + 1}); "
                    f"shorten the chain or run the ops sequentially")
            layout = image_util.make_layout(h, w, c, halo=r,
                                            itemsize=4 if f32 else 1)
            planar = _sync(jax.device_put(
                to_planar(self.host_image, layout), self.device))
        fn = (chain_model.make_fused_chain_f32(layout, cols) if f32
              else chain_model.make_fused_chain(layout, cols))
        # expose to execution_table: chains are shape-preserving, so the
        # chained-K marginal applies directly (on the chain's own planar)
        self._chain_exec = (fn, planar)
        op = aot_wrap(self, fn)

        def run():
            self._sample = _sync(op(planar))

        if f32:
            def fetch():
                from . import oracle_f32
                arr = np.asarray(self._sample)
                py, px = layout.pad_y, layout.pad_x
                return oracle_f32.to_uint8_hwc(
                    arr[:, py:py + layout.height, px:px + layout.width])
        else:
            def fetch():
                return from_planar_padded(np.asarray(self._sample), layout)

        desc, col, seq_oracle = chain_model.chain_row_parts(
            cols, dtype=self.dtype)
        self._extra_oracles[col] = seq_oracle
        return Operation(desc, "chain", col, run, fetch)

    def _fetch_sample(self) -> np.ndarray:
        raise RuntimeError("memory ops produce no image")  # prefix == ""

    @property
    def verify_atol(self) -> int:
        """0 for the uint8 model (bit-exact contract); 1 for float32, where
        XLA's FMA/reassociation legitimately differs from the NumPy oracle
        by 1 ulp, which the final u8 quantization can turn into 1 level."""
        return 1 if self.dtype == "float32" else 0

    def oracle_ops(self) -> dict:
        """The golden-op dict matching this session's data model, for
        harness output verification (uint8 HWC in, uint8 HWC expected out)."""
        if self.dtype == "float32":
            from . import oracle_f32
            base = oracle_f32.uint8_verify_ops()
            if self._extra_oracles:  # chain rows' sequential f32 oracles
                base = {**base, **self._extra_oracles}
            return base
        from . import native, oracle
        base = (native.image_ops() if native.available()
                else oracle.IMAGE_OPS)
        if self._extra_oracles:
            base = {**base, **self._extra_oracles}
        return base
