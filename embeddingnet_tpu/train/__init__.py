"""Training subsystem: optimizers, train state, jitted steps, host loop.

Functional re-design of the reference's Keras compile/fit machinery
(``tools/train.py:79-177``): params/opt-state/batch-stats/RNG/step live in
one :class:`TrainState` pytree, the per-batch work is a single jitted
(or pjit-sharded) step with in-step mining, and the Keras callback stack
(LR schedule, ReduceLROnPlateau, EarlyStopping, best-checkpoint) becomes
explicit host-loop logic in :mod:`embeddingnet_tpu.train.callbacks`.
"""

from embeddingnet_tpu.train.optim import (  # noqa: F401
    get_optimizer, step_decay_schedule, l2_penalty)
from embeddingnet_tpu.train.state import TrainState  # noqa: F401
from embeddingnet_tpu.train.steps import (  # noqa: F401
    make_triplet_train_step, make_siamese_train_step, make_softmax_train_step,
    make_eval_step)
from embeddingnet_tpu.train.loop import Trainer  # noqa: F401
