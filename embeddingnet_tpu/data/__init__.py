"""Data subsystem: dataset index, samplers, host decode pipeline.

TPU-native re-design of ``embedding_net/datagenerators.py``: the index and
samplers are host Python (cheap), image decode runs in a thread pool, and
batches reach the device as uint8 ``(images, labels)`` — augmentation and
normalization happen on device inside the train step. The reference's
generator->model cycle (mining called ``predict`` from the data loader,
``datagenerators.py:214``) is gone: mining lives in
:mod:`embeddingnet_tpu.ops.mining`.
"""

from embeddingnet_tpu.data.index import ENDataLoader  # noqa: F401
from embeddingnet_tpu.data.samplers import (  # noqa: F401
    PKSampler, PairSampler, ProcessShardSampler, SimpleSampler,
    TripletSampler)
from embeddingnet_tpu.data.pipeline import BatchLoader, DecodeCache  # noqa: F401
