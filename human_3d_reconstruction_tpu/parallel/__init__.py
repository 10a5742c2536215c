"""Device-mesh / sharding helpers (DP over the batch axis).

Reference parity (SURVEY.md section 2 "Parallelism strategies"): the
reference's only parallelism is single-node torch DataParallel. The
TPU-native equivalent is jit + NamedSharding over a 1-D 'data' mesh: XLA
inserts the gradient all-reduce over ICI automatically. TP/PP/EP/SP do not
apply to this workload (25M-param model, no sequence axis) — recorded in
SURVEY.md sections 2 and 5 so nobody hunts for them here.
"""

from human_3d_reconstruction_tpu.parallel.mesh import (
    DATA_AXIS,
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = ["DATA_AXIS", "make_mesh", "shard_batch", "replicate"]
