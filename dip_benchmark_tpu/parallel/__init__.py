from .halo import (  # noqa: F401
    exchange_row_halo,
    make_mesh,
    sharded_fused_pipeline,
    sharded_op,
)
