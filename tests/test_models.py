"""Backbone zoo shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from embeddingnet_tpu.models import EmbeddingModule, get_backbone
from embeddingnet_tpu.models.registry import backbone_param_mask


def init_module(name, input_shape=(96, 96, 3), encodings_len=64, **kw):
    mod = EmbeddingModule(backbone_name=name, encodings_len=encodings_len,
                          **kw)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2,) + input_shape, jnp.float32)
    variables = mod.init({"params": rng, "dropout": rng}, x, train=False,
                         method="init_all")
    return mod, variables, x


@pytest.mark.parametrize("name,input_shape", [
    ("simple", (96, 96, 3)),
    ("simple2", (48, 48, 3)),
    ("resnet18", (64, 64, 3)),
    ("resnet50", (64, 64, 3)),
    pytest.param("efficientnet-b0", (64, 64, 3), marks=pytest.mark.slow),
])
def test_backbone_embedding_shape(name, input_shape):
    mod, variables, x = init_module(name, input_shape)
    emb = mod.apply(variables, x, train=False,
                    mutable=False if "batch_stats" not in variables else [])
    if isinstance(emb, tuple):
        emb = emb[0]
    assert emb.shape == (2, 64)
    assert np.isfinite(np.asarray(emb)).all()


def test_l2_normalization_on_and_off():
    for norm, expect_unit in [(True, True), (False, False)]:
        mod = EmbeddingModule(backbone_name="simple", encodings_len=32,
                              embeddings_normalization=norm)
        rng = jax.random.PRNGKey(1)
        x = jax.random.uniform(rng, (4, 96, 96, 3))
        variables = mod.init({"params": rng}, x)
        emb = np.asarray(mod.apply(variables, x))
        norms = np.linalg.norm(emb, axis=1)
        if expect_unit:
            np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        else:
            assert not np.allclose(norms, 1.0, atol=1e-3)


def test_features_path_simple():
    """features() == the reference backbone_model output (pre-head)."""
    mod, variables, x = init_module("simple")
    feats = mod.apply(variables, x, method="features")
    assert feats.ndim == 2  # flatten output (backbones.py:32-34)
    emb = mod.apply(variables, x)
    assert emb.shape[-1] == 64


def test_features_path_zoo():
    mod, variables, x = init_module("resnet18", (64, 64, 3))
    feats = mod.apply(variables, x, method="features")
    assert feats.ndim == 4  # conv feature map
    assert feats.shape[1] == 64 // 32


def test_classify_head():
    mod, variables, x = init_module("simple")
    out = mod.apply(variables, x, method="classify")
    out = np.asarray(out)
    assert out.shape == (2, 1)
    assert ((out >= 0) & (out <= 1)).all()  # sigmoid (models.py:44)


def test_batchnorm_mutable_stats():
    mod, variables, x = init_module("simple2", (48, 48, 3))
    assert "batch_stats" in variables
    emb, updates = mod.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
    assert "batch_stats" in updates


def test_dropout_is_stochastic_in_train():
    mod, variables, x = init_module("simple2", (48, 48, 3))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 48, 48, 3))
    e1, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    e2, _ = mod.apply(variables, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
    # eval mode is deterministic
    e3 = mod.apply(variables, x, train=False)
    e4 = mod.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e4))


def test_get_backbone_factory():
    module, variables = get_backbone((96, 96, 3), encodings_len=32,
                                     backbone_name="simple",
                                     backbone_weights=None)
    emb = module.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert emb.shape == (1, 32)


def test_unknown_backbone_raises():
    with pytest.raises(ValueError, match="unknown backbone"):
        init_module("resnext-9000")


def test_freeze_backbone_mask():
    mod, variables, x = init_module("resnet18", (64, 64, 3))
    mask = backbone_param_mask(variables["params"], freeze_backbone=True)
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    frozen = [v for p, v in leaves
              if any(getattr(k, "key", None) == "backbone" for k in p)]
    trainable = [v for p, v in leaves
                 if not any(getattr(k, "key", None) == "backbone" for k in p)]
    assert frozen and not any(frozen)
    assert trainable and all(trainable)
    mask_off = backbone_param_mask(variables["params"], freeze_backbone=False)
    assert all(jax.tree_util.tree_leaves(mask_off))


def test_jit_embedding_forward():
    mod, variables, x = init_module("simple")
    f = jax.jit(lambda v, x: mod.apply(v, x))
    e = f(variables, x)
    assert e.shape == (2, 64)


def test_vit_backbone_shapes():
    mod, variables, x = init_module("vit-b32", (64, 64, 3))
    emb = mod.apply(variables, x, train=False)
    assert emb.shape == (2, 64)
    feats = mod.apply(variables, x, method="features")
    assert feats.shape == (2, 2, 2, 768)  # 64/32 grid


@pytest.mark.parametrize("name", ["seresnet18", "seresnet50", "resnext50"])
def test_se_and_resnext_variants(name):
    mod, variables, x = init_module(name, (64, 64, 3))
    emb = mod.apply(variables, x, train=False,
                    mutable=[] if "batch_stats" in variables else False)
    if isinstance(emb, tuple):
        emb = emb[0]
    assert emb.shape == (2, 64)
    assert np.isfinite(np.asarray(emb)).all()
    if name.startswith("seresnet"):
        # SE params present
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        assert any("se" in "/".join(str(getattr(k, "key", k)) for k in p)
                   for p, _ in flat)


def test_small_input_clear_error():
    with pytest.raises(ValueError, match="needs input >="):
        init_module("simple", (48, 48, 3))
    with pytest.raises(ValueError, match="needs input >="):
        init_module("simple2", (16, 16, 3))


def test_mobilenetv2_backbone():
    mod, variables, x = init_module("mobilenetv2", (64, 64, 3))
    emb = mod.apply(variables, x, train=False,
                    mutable=[] if "batch_stats" in variables else False)
    if isinstance(emb, tuple):
        emb = emb[0]
    assert emb.shape == (2, 64)
    assert np.isfinite(np.asarray(emb)).all()
    feats = mod.apply(variables, x, method="features", mutable=[])[0]
    assert feats.shape[-1] == 1280


import pytest as _pytest


@_pytest.mark.parametrize("backbone,px", [
    # 35-130s compiles each on the quick-loop box -> full suite only.
    _pytest.param("densenet121", 32, marks=_pytest.mark.slow),
    ("vgg16", 32), ("mobilenet", 32),
    ("seresnext50", 32),
    _pytest.param("senet154", 32, marks=_pytest.mark.slow),
    _pytest.param("inceptionv3", 96, marks=_pytest.mark.slow),
    _pytest.param("inceptionresnetv2", 96, marks=_pytest.mark.slow),
    ("xception", 64),
    _pytest.param("nasnetmobile", 32, marks=_pytest.mark.slow),
])
def test_new_zoo_backbones_forward(backbone, px):
    """Zoo registry entries build and encode (reference zoo surface,
    backbones.py:100-104 reaches these via classification_models)."""
    import jax as _jax
    import jax.numpy as _jnp
    from embeddingnet_tpu.models import EmbeddingModule

    m = EmbeddingModule(backbone_name=backbone, encodings_len=16)
    v = m.init({"params": _jax.random.PRNGKey(0)},
               _jnp.zeros((1, px, px, 3)), train=False)
    out = m.apply(v, _jnp.zeros((2, px, px, 3)), train=False)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_load_model_merges_encoder_view_export(tmp_path):
    """arcface/siamese training exports the encoder view (no
    'classifier' subtree); load_model must merge it into the fresh-init
    template instead of failing the strict restore, and the encodings
    fingerprint must ignore the (fresh-random) classifier head."""
    import jax
    from embeddingnet_tpu.config import params_from_dict
    from embeddingnet_tpu.models import EmbeddingNet

    cfg = {
        "MODEL": {"input_shape": [32, 32, 3], "encodings_len": 8,
                  "mode": "arcface", "backbone_name": "simple2",
                  "backbone_weights": None,
                  "embeddings_normalization": False},
        "DATALOADER": {"dataset_path": str(tmp_path)},
        "GENERATOR": {"k_classes": 2, "k_samples": 2},
        "TRAIN": {"learning_rate": 1e-3, "n_epochs": 1},
        "GENERAL": {"project_name": "enc_view", "work_dir": str(tmp_path)},
    }
    donor = EmbeddingNet(params_from_dict(cfg))
    # encoder-view export: params WITHOUT the classifier subtree
    # (batch_stats travel with the encoder, like Trainer.encoder_variables)
    params_no_clf = {k: v for k, v in donor.variables["params"].items()
                     if k != "classifier"}
    donor.variables = {"params": params_no_clf,
                       **({"batch_stats": donor.variables["batch_stats"]}
                          if "batch_stats" in donor.variables else {})}
    path = donor.save_base_model(str(tmp_path / "m"))
    fp_saved = donor.weights_fingerprint()

    loaded = EmbeddingNet(params_from_dict(cfg))
    loaded.load_model(path)
    # encoder weights restored; fresh classifier kept; fingerprint equal
    assert "classifier" in loaded.variables["params"]
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(
            loaded.variables["params"]["backbone"])[0]),
        np.asarray(jax.tree_util.tree_leaves(
            params_no_clf["backbone"])[0]))
    assert loaded.weights_fingerprint() == fp_saved
