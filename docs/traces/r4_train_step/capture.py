import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, optax
from embeddingnet_tpu.models import EmbeddingModule
from embeddingnet_tpu.train import TrainState
from embeddingnet_tpu.train.steps import make_triplet_train_step
from embeddingnet_tpu.train.packing import StatePacker

B, IMG, KS = 1024, 64, 4
module = EmbeddingModule(backbone_name="resnet50", encodings_len=256,
                         embeddings_normalization=True, dtype=jnp.bfloat16)
variables = module.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, IMG, IMG, 3), jnp.float32), train=False)
optimizer = optax.adam(1e-3)
state = TrainState.create(variables, optimizer)
base = make_triplet_train_step(module, optimizer, margin=0.5, mode="batch_all",
                               compute_dtype=jnp.bfloat16,
                               max_positives=KS - 1)
packer = StatePacker(state)
step = jax.jit(packer.wrap_step(base))
state = jax.jit(packer.pack_state)(state)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 255, (B, IMG, IMG, 3), np.uint8))
labels = jnp.asarray(np.repeat(np.arange(B // KS), KS).astype(np.int32))
state, m = step(state, x, labels); float(m["loss"])
jax.profiler.start_trace("/root/repo/docs/traces/r4_train_step")
for _ in range(5):
    state, m = step(state, x, labels)
float(m["loss"])
jax.profiler.stop_trace()
print("traced")
