"""Oracle tests for ops/fused_conv.py — the Pallas small-spatial 3x3
conv must match ``lax.conv_general_dilated`` (the XLA path it replaces)
in forward and both gradients. Runs in Pallas interpret mode on the CPU
test mesh; the real-TPU timings live in tools/pallas_conv_bench.py and
docs/BENCHMARKS.md."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingnet_tpu.ops import fused_conv as fc


def _lax_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("b,s,cin,cout", [
    (16, 2, 128, 128),
    (8, 4, 128, 256),
    (8, 8, 256, 128),   # kernel supports S=8; dispatch excludes it
])
def test_forward_matches_lax(b, s, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, s, s, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    assert fc.eligible(x.shape, w.shape) == (s in (2, 4))
    got = fc.conv3x3_small(x, w)
    want = _lax_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_forward_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 2, 2, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    got = np.asarray(fc.conv3x3_small(x, w), np.float32)
    want = np.asarray(_lax_conv(x, w), np.float32)
    # both f32-accumulate; bf16 storage rounding only
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gradients_match_lax():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)

    def loss_pallas(x, w):
        return jnp.sum(fc.conv3x3_small(x, w) * cot)

    def loss_lax(x, w):
        return jnp.sum(_lax_conv(x, w) * cot)

    dx_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    dx_l, dw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_l),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_l),
                               rtol=1e-3, atol=1e-3)


def test_mixed_gradients_match_lax():
    """8x8 takes the mixed path: XLA forward, Pallas backward — the
    values AND both gradients must match the pure-lax conv."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(16, 8, 8, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(16, 8, 8, 128)), jnp.float32)
    assert fc.eligible_mixed(x.shape, w.shape)

    got = fc.conv3x3_small_mixed(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_lax_conv(x, w)),
                               rtol=1e-5, atol=1e-5)  # fwd IS lax

    def loss_mixed(x, w):
        return jnp.sum(fc.conv3x3_small_mixed(x, w) * cot)

    def loss_lax(x, w):
        return jnp.sum(_lax_conv(x, w) * cot)

    dx_m, dw_m = jax.grad(loss_mixed, argnums=(0, 1))(x, w)
    dx_l, dw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_m), np.asarray(dx_l),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw_m), np.asarray(dw_l),
                               rtol=1e-3, atol=1e-3)


def test_mixed_eligibility_gate():
    w = (3, 3, 128, 128)
    assert fc.eligible_mixed((16, 8, 8, 128), w)
    assert not fc.eligible_mixed((16, 4, 4, 128), w)   # full-Pallas size
    assert not fc.eligible_mixed((16, 16, 16, 128), w)
    assert not fc.eligible_mixed((16, 8, 8, 128), w, strides=(2, 2))
    assert not fc.eligible_mixed((16, 8, 8, 64), (3, 3, 64, 128))


def test_eligibility_gate():
    w = (3, 3, 128, 128)
    assert fc.eligible((16, 4, 4, 128), w)
    assert not fc.eligible((16, 4, 4, 128), w, strides=(2, 2))
    assert not fc.eligible((16, 4, 4, 128), w, groups=32)
    assert not fc.eligible((16, 6, 6, 128), (3, 3, 128, 128))   # S not 2/4
    assert not fc.eligible((16, 8, 8, 128), w)   # 8x8: measured a wash
    assert not fc.eligible((16, 16, 16, 128), w)                # too big
    assert not fc.eligible((16, 4, 4, 64), (3, 3, 64, 64))      # lanes
    assert not fc.eligible((7, 4, 4, 128), w)                   # batch tile
    assert not fc.eligible((16, 4, 4, 128), (1, 1, 128, 128))   # not 3x3


@pytest.mark.slow
def test_resnet50_fast_conv_parity():
    """The PERFORMANCE.pallas_conv flag must not change ResNet-50's
    function: identical params (the trees are interchangeable by
    construction), same embeddings, at the headline 64px geometry where
    stages 2-4 (8x8/4x4/2x2) take the Pallas path."""
    from embeddingnet_tpu.models.registry import EmbeddingModule

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)), jnp.float32)
    slow = EmbeddingModule(backbone_name="resnet50", encodings_len=32)
    fast = EmbeddingModule(backbone_name="resnet50", encodings_len=32,
                           fast_conv=True)
    variables = slow.init({"params": jax.random.PRNGKey(0)}, x,
                          train=False, method="init_all")
    want = np.asarray(slow.apply(variables, x, train=False))
    got = np.asarray(fast.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_trainer_uses_spmd_pallas_conv_on_mesh(tiny_dataset, tmp_path):
    """On a >1-device mesh the Trainer keeps the Pallas path through the
    custom_partitioning-wrapped SPMD kernels (and says so)."""
    from embeddingnet_tpu.config import params_from_dict
    from embeddingnet_tpu.data import ENDataLoader
    from embeddingnet_tpu.train import Trainer

    params = params_from_dict({
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 8,
                  "mode": "triplet", "backbone_name": "simple2",
                  "backbone_weights": None},
        "DATALOADER": {"dataset_path": tiny_dataset, "validate": False},
        "GENERATOR": {"negatives_selection_mode": "batch_all",
                      "k_classes": 4, "k_samples": 2, "n_batches": 1},
        "TRAIN": {"optimizer": "adam", "n_epochs": 1,
                  "plot_history": False},
        "GENERAL": {"project_name": "p", "work_dir": str(tmp_path)},
        "MESH": {"data": 2},
        "PERFORMANCE": {"compute_dtype": "float32", "pallas_conv": True},
    })
    logs = []
    loader = ENDataLoader(tiny_dataset, validate=False)
    trainer = Trainer(params, loader, log_fn=logs.append)
    assert trainer._fast_conv == "spmd"
    assert any("SPMD-partitioned Pallas conv" in str(m) for m in logs)


def _mesh8():
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()[:8]), ("data",))


def test_spmd_conv_matches_lax_under_mesh():
    """Batch-sharded conv3x3_small_spmd: value and both grads match the
    plain lax conv, the batch sharding passes through with zero
    all-gathers, and the wgrad carries its psum all-reduce."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh8()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(64, 4, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(64, 4, 4, 128)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    wr = jax.device_put(w, NamedSharding(mesh, P()))

    fwd = jax.jit(fc.conv3x3_small_spmd)
    got = fwd(xs, wr)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_lax_conv(x, w)),
                               rtol=1e-4, atol=1e-4)
    assert got.sharding.spec == P("data")
    hlo = fwd.lower(xs, wr).compile().as_text()
    assert "all-gather" not in hlo

    def loss_spmd(x, w):
        return jnp.sum(fc.conv3x3_small_spmd(x, w) * cot)

    def loss_lax(x, w):
        return jnp.sum(_lax_conv(x, w) * cot)

    gfn = jax.jit(jax.grad(loss_spmd, argnums=(0, 1)))
    dx_s, dw_s = gfn(xs, wr)
    dx_l, dw_l = jax.grad(loss_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_l),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw_s), np.asarray(dw_l),
                               rtol=1e-3, atol=1e-3)
    ghlo = gfn.lower(xs, wr).compile().as_text()
    assert "all-gather" not in ghlo
    assert "all-reduce" in ghlo  # the wgrad psum


def test_spmd_conv_local_fallback():
    """A shard whose local batch misses the Pallas gate (global 8 over 8
    devices -> local 1) must fall back to the XLA conv inside the
    partitioned lowering — same values and gradients."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh8()
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    wr = jax.device_put(w, NamedSharding(mesh, P()))

    def loss_spmd(x, w):
        return jnp.sum(fc.conv3x3_small_spmd(x, w) * cot)

    val, (dx, dw) = jax.jit(
        jax.value_and_grad(loss_spmd, argnums=(0, 1)))(xs, wr)
    want = jnp.sum(_lax_conv(x, w) * cot)
    np.testing.assert_allclose(float(val), float(want), rtol=1e-4)
    dx_l, dw_l = jax.grad(
        lambda x, w: jnp.sum(_lax_conv(x, w) * cot), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_l),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_l),
                               rtol=1e-3, atol=1e-3)


def test_spmd_fastconv_module_under_mesh():
    """FastConv3x3(spmd=True) inside jit with a batch-sharded input
    matches the spmd=False single-device module bit-for-bit semantics
    (same params, same values, grads included)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh8()
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(32, 2, 2, 128)), jnp.float32)
    plain = fc.FastConv3x3(features=128)
    spmd = fc.FastConv3x3(features=128, spmd=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss(mod, v, x):
        return jnp.sum(mod.apply(v, x) ** 2)

    want = loss(plain, variables, x)
    got, grads = jax.jit(jax.value_and_grad(
        lambda v, x: loss(spmd, v, x)))(variables, xs)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)
    g_ref = jax.grad(lambda v: loss(plain, v, x))(variables)
    np.testing.assert_allclose(
        np.asarray(grads["params"]["kernel"]),
        np.asarray(g_ref["params"]["kernel"]), rtol=1e-3, atol=1e-3)


def test_fastconv_module_param_compat():
    """FastConv3x3's param tree is interchangeable with nn.Conv's, and
    its output matches nn.Conv under the same kernel — on both the
    Pallas-eligible and the fallback shapes."""
    import flax.linen as nn
    rng = np.random.default_rng(3)

    for shape in [(16, 2, 2, 128), (4, 7, 7, 32)]:  # eligible / fallback
        x = jnp.asarray(rng.normal(size=shape), jnp.float32)
        fast = fc.FastConv3x3(features=128)
        ref = nn.Conv(128, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False)
        vars_ref = ref.init(jax.random.PRNGKey(0), x)
        assert (vars_ref["params"]["kernel"].shape
                == (3, 3, shape[-1], 128))
        got = fast.apply(vars_ref, x)       # nn.Conv params drop in
        want = ref.apply(vars_ref, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_hardware_gates_vmem_and_dtype(monkeypatch):
    """On real TPU (non-interpret) the gates must also bound the VMEM
    weight block and restrict to the calibrated 2-byte compute dtypes;
    in interpret mode (this CI) those gates stay open so the f32 oracle
    tests keep exercising the kernels."""
    w512 = (3, 3, 512, 512)
    w1024 = (3, 3, 1024, 1024)

    # interpret mode (CPU): f32 and wide channels stay eligible
    assert fc.eligible((1024, 2, 2, 512), w512, itemsize=4)
    assert fc.eligible((1024, 2, 2, 1024), w1024, itemsize=2)

    monkeypatch.setattr(fc, "_interpret", lambda: False)
    # the calibrated production shape still passes
    assert fc.eligible((1024, 2, 2, 512), w512, itemsize=2)
    assert fc.eligible_mixed((1024, 8, 8, 128), (3, 3, 128, 128),
                             itemsize=2)
    # f32 compute: unvalidated on-chip -> fall back
    assert not fc.eligible((1024, 2, 2, 512), w512, itemsize=4)
    assert not fc.eligible_mixed((1024, 8, 8, 128), (3, 3, 128, 128),
                                 itemsize=4)
    # weight block over the VMEM cap (9*1024*1024*2 B ~= 18.9 MB)
    assert not fc.eligible((1024, 2, 2, 1024), w1024, itemsize=2)


# ---------------------------------------------------------------------
# BN-apply + ReLU fused into the conv prologue
# ---------------------------------------------------------------------


def _lax_bn_relu_conv(x, w, scale, bias):
    """Unfused oracle of conv3x3_small_bn_relu: f32 affine+relu cast
    back to x.dtype, then the XLA conv."""
    z = jnp.maximum(x.astype(jnp.float32) * scale + bias, 0.0)
    return _lax_conv(z.astype(x.dtype), w)


def test_bn_relu_fused_matches_lax():
    """conv3x3_small_bn_relu: value and all four gradients match the
    unfused lax expression (the SAME-padding ring must stay zero after
    the affine — relu(bias) != 0 — which the kernels re-mask)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    # biases well away from 0 so relu(bias) != 0 exercises the ring mask
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(8, 4, 4, 128)), jnp.float32)

    got = fc.conv3x3_small_bn_relu(x, w, scale, bias)
    want = _lax_bn_relu_conv(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)

    def loss_fused(x, w, s, b):
        return jnp.sum(fc.conv3x3_small_bn_relu(x, w, s, b) * cot)

    def loss_lax(x, w, s, b):
        return jnp.sum(_lax_bn_relu_conv(x, w, s, b) * cot)

    g_f = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    g_l = jax.grad(loss_lax, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_ in zip(g_f, g_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)


def test_bn_relu_fused_spmd_under_mesh():
    """conv3x3_small_bn_relu_spmd with a batch-sharded input: value and
    all gradients match the unfused oracle; no all-gather on the
    activation path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = _mesh8()
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(64, 2, 2, 128)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 128, 128)) * 0.05, jnp.float32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=(128,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(128,)) + 1.0, jnp.float32)
    cot = jnp.asarray(rng.normal(size=(64, 2, 2, 128)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    def loss_spmd(x, w, s, b):
        return jnp.sum(fc.conv3x3_small_bn_relu_spmd(x, w, s, b) * cot)

    def loss_lax(x, w, s, b):
        return jnp.sum(_lax_bn_relu_conv(x, w, s, b) * cot)

    vg = jax.jit(jax.value_and_grad(loss_spmd, argnums=(0, 1, 2, 3)))
    val, g_s = vg(xs, w, scale, bias)
    want = loss_lax(x, w, scale, bias)
    np.testing.assert_allclose(float(val), float(want), rtol=1e-4)
    g_l = jax.grad(loss_lax, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_ in zip(g_s, g_l):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-3)
    hlo = vg.lower(xs, w, scale, bias).compile().as_text()
    assert "all-gather" not in hlo


def test_bn_scale_bias_matches_batchnorm():
    """BNScaleBias: identical param/variable tree to nn.BatchNorm, the
    returned affine reproduces the BatchNorm output in train AND eval
    mode, and the running-average update matches."""
    import flax.linen as nn

    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.normal(2.0, 3.0, size=(16, 4, 4, 32)), jnp.float32)

    kw = dict(momentum=0.9, epsilon=1e-3)
    bn = nn.BatchNorm(**kw)
    sb = fc.BNScaleBias(**kw)

    v_bn = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)
    v_sb = sb.init(jax.random.PRNGKey(0), x, use_running_average=False)
    assert jax.tree.structure(v_bn) == jax.tree.structure(v_sb)

    # seed non-trivial gamma/beta so the affine actually matters
    v = jax.tree.map(lambda a: a, v_bn)
    v["params"]["scale"] = jnp.asarray(
        rng.uniform(0.5, 1.5, size=(32,)), jnp.float32)
    v["params"]["bias"] = jnp.asarray(rng.normal(size=(32,)), jnp.float32)

    # train mode: output parity + identical batch_stats update
    want, m_bn = bn.apply(v, x, use_running_average=False,
                          mutable=["batch_stats"])
    (scale, bias), m_sb = sb.apply(v, x, use_running_average=False,
                                   mutable=["batch_stats"])
    got = x * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6),
        m_bn["batch_stats"], m_sb["batch_stats"])

    # eval mode on the updated stats
    v2 = {"params": v["params"], "batch_stats": m_bn["batch_stats"]}
    want_e = bn.apply(v2, x, use_running_average=True)
    scale_e, bias_e = sb.apply(v2, x, use_running_average=True)
    np.testing.assert_allclose(np.asarray(x * scale_e + bias_e),
                               np.asarray(want_e), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_resnet18_fused_train_parity():
    """fast_conv on vs off for ResNet-18 in TRAIN mode at the headline
    64px geometry (stages at 4x4/2x2 with 256/512 channels take the
    fused BN+ReLU+conv path): same embeddings, same param gradients,
    same batch_stats updates — the flag only changes the compute path."""
    from embeddingnet_tpu.models.registry import EmbeddingModule

    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.uniform(size=(8, 64, 64, 3)), jnp.float32)
    slow = EmbeddingModule(backbone_name="resnet18", encodings_len=32)
    fast = EmbeddingModule(backbone_name="resnet18", encodings_len=32,
                           fast_conv=True)
    variables = slow.init({"params": jax.random.PRNGKey(0)}, x,
                          train=False, method="init_all")
    assert (jax.tree.structure(variables)
            == jax.tree.structure(fast.init(
                {"params": jax.random.PRNGKey(0)}, x, train=False,
                method="init_all")))

    def loss(module, params):
        def f(p):
            emb, mut = module.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(emb * emb), (emb, mut)
        return jax.value_and_grad(f, has_aux=True)(params)

    (v_s, (emb_s, mut_s)), g_s = loss(slow, variables["params"])
    (v_f, (emb_f, mut_f)), g_f = loss(fast, variables["params"])
    np.testing.assert_allclose(np.asarray(emb_f), np.asarray(emb_s),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(v_f), float(v_s), rtol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4),
        g_f, g_s)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        mut_f["batch_stats"], mut_s["batch_stats"])
