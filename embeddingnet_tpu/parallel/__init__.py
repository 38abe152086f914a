"""Parallelism: device mesh, sharded train steps, distributed mining.

The reference's only strategy is single-host mirrored data parallel
(``tools/train.py:121-140``). Here scaling is a ``jax.sharding.Mesh``:
batch (and the B x B pairwise-distance matrix) sharded over the ``data``
axis, params replicated (or sharded over ``model`` for very large heads),
with XLA inserting all-gather/psum over ICI — no NCCL-style user code.
"""

from embeddingnet_tpu.parallel.mesh import (  # noqa: F401
    build_mesh, batch_sharding, replicated)
from embeddingnet_tpu.parallel.sharded import (  # noqa: F401
    shard_train_step, sharded_batch_all_loss)
from embeddingnet_tpu.parallel.sharded_knn import (  # noqa: F401
    sharded_knn, sharded_knn_quantized)
from embeddingnet_tpu.parallel.tp import (  # noqa: F401
    shard_train_step_tp, tp_shardings, device_put_state)
from embeddingnet_tpu.parallel.pp import (  # noqa: F401
    pipeline_blocks_forward, stack_stage_params)
