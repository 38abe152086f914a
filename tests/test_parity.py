"""Weight-ported parity vs the actual tf.keras reference architectures.

The north-star parity target (BASELINE.md): embeddings <1e-5 vs the Keras
reference with the same weights and preprocessing. TF runs the *reference
code path itself* (the ``simple`` backbone is rebuilt exactly as
``embedding_net/backbones.py:19-41`` builds it); weights transfer through
``models.pretrained`` converters. Random init, no downloads — the mapping
is what is under test.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from embeddingnet_tpu.models import pretrained  # noqa: E402
from embeddingnet_tpu.models.simple import SimpleCNN  # noqa: E402
from embeddingnet_tpu.models.resnet import resnet50  # noqa: E402

pytestmark = pytest.mark.parity


def build_reference_simple(input_shape, encodings_len, normalize=True):
    """The reference ``simple`` base_model, layer-for-layer
    (``backbones.py:19-41``)."""
    from tensorflow.keras.layers import (Conv2D, Dense, Flatten, Input,
                                         Lambda, MaxPool2D)
    from tensorflow.keras.models import Model
    from tensorflow.keras.regularizers import l2
    import tensorflow.keras.backend as K

    input_image = Input(input_shape)
    x = Conv2D(64, (10, 10), activation="relu",
               kernel_regularizer=l2(2e-4))(input_image)
    x = MaxPool2D()(x)
    x = Conv2D(128, (7, 7), activation="relu",
               kernel_regularizer=l2(2e-4))(x)
    x = MaxPool2D()(x)
    x = Conv2D(128, (4, 4), activation="relu",
               kernel_regularizer=l2(2e-4))(x)
    x = MaxPool2D()(x)
    x = Conv2D(256, (4, 4), activation="relu",
               kernel_regularizer=l2(2e-4))(x)
    x = Flatten()(x)
    encoded = Dense(encodings_len, activation="relu",
                    kernel_regularizer=l2(1e-3))(x)
    if normalize:
        encoded = Lambda(lambda t: K.l2_normalize(t, axis=1),
                         name="l2_norm")(encoded)
    return Model(inputs=[input_image], outputs=[encoded])


@pytest.mark.parametrize("normalize", [True, False])
def test_simple_backbone_parity(normalize):
    input_shape = (96, 96, 3)
    encodings_len = 64
    keras_model = build_reference_simple(input_shape, encodings_len,
                                         normalize)

    rng = np.random.default_rng(0)
    # training-path preprocessing: uint8 -> /255. (datagenerators.py:156)
    images = rng.integers(0, 255, (4,) + input_shape).astype(np.float32) / 255.0

    ref_out = keras_model.predict(images, verbose=0)

    module = SimpleCNN(encodings_len=encodings_len,
                       embeddings_normalization=normalize)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1,) + input_shape))
    params = pretrained.keras_simple_to_flax(keras_model, encodings_len)
    out = np.asarray(module.apply({"params": params}, jnp.asarray(images)))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-4)


def test_resnet50_backbone_parity():
    """tf.keras.applications ResNet50 (random weights, include_top=False)
    vs our Flax ResNet-50 with ported weights — feature-map parity."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.ResNet50(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(1)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    module = resnet50(stride_in_3x3=False, use_bias=True)
    params, batch_stats = pretrained.keras_resnet50_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))

    assert out.shape == ref_out.shape
    # BN in inference + 50 conv layers accumulate fp32 noise; the spec
    # target (<1e-5 on embeddings) is checked on the normalized embedding
    # in test_embedding_parity_resnet50 below.
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_embedding_parity_resnet50():
    """Full encoder parity: ported ResNet50 + GAP head, L2-normalized
    embedding <1e-5 vs the Keras equivalent (backbones.py:110-121)."""
    input_shape = (64, 64, 3)
    encodings_len = 64
    keras_backbone = tf.keras.applications.ResNet50(
        weights=None, include_top=False, input_shape=input_shape)
    from tensorflow.keras.layers import Dense, GlobalAveragePooling2D, Lambda
    from tensorflow.keras.models import Model
    import tensorflow.keras.backend as K

    x = GlobalAveragePooling2D()(keras_backbone.output)
    x = Dense(encodings_len // 2, activation="relu", name="head_d1")(x)
    x = Dense(encodings_len, activation="relu", name="head_d2")(x)
    x = Lambda(lambda t: K.l2_normalize(t, axis=1))(x)
    keras_model = Model(inputs=[keras_backbone.input], outputs=[x])

    rng = np.random.default_rng(2)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.heads import EmbeddingHead
    import flax.linen as nn

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = resnet50(stride_in_3x3=False, use_bias=True,
                             name="backbone")(x, train=False)
            return EmbeddingHead(encodings_len, True, name="head")(feats)

    params, batch_stats = pretrained.keras_resnet50_to_flax(keras_backbone)
    d1_k, d1_b = keras_model.get_layer("head_d1").get_weights()
    d2_k, d2_b = keras_model.get_layer("head_d2").get_weights()
    variables = {
        "params": {"backbone": params,
                   "head": {"dense_1": {"kernel": d1_k, "bias": d1_b},
                            "dense_2": {"kernel": d2_k, "bias": d2_b}}},
        "batch_stats": {"backbone": batch_stats},
    }
    out = np.asarray(Encoder().apply(variables, jnp.asarray(images)))
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("variant", ["b0", "b1"])
def test_efficientnet_backbone_parity(variant):
    """tf.keras EfficientNetB* (random weights, include_top=False) vs our
    Flax EfficientNet with ported weights. Keras embeds Rescaling(1/255) +
    identity Normalization, so keras gets raw 0..255 and ours gets /255."""
    input_shape = (64, 64, 3)
    ctor = {"b0": tf.keras.applications.EfficientNetB0,
            "b1": tf.keras.applications.EfficientNetB1}[variant]
    keras_model = ctor(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(3)
    raw = rng.uniform(0, 255, size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(raw, verbose=0)

    from embeddingnet_tpu.models.efficientnet import build_efficientnet
    module = build_efficientnet(f"efficientnet-{variant}")
    params, batch_stats = pretrained.keras_efficientnet_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(raw / 255.0), train=False))

    assert out.shape == ref_out.shape
    # north-star parity: the r2 5e-3 tolerance was slack, not error — the
    # ported stack is float-exact (measured 3e-11 at 64px on CPU)
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-4)


def test_embedding_parity_efficientnet_b1():
    """Full encoder parity for the reference's DEFAULT backbone
    (efficientnet-b1, configs/road_signs_apollo.yml:6): ported weights +
    GAP head, L2-normalized embedding <1e-5 vs the Keras equivalent
    (backbones.py:83-98 + 110-121) — BASELINE.md's bitwise-comparable
    target on the family the reference actually ships."""
    input_shape = (64, 64, 3)
    encodings_len = 64
    keras_backbone = tf.keras.applications.EfficientNetB1(
        weights=None, include_top=False, input_shape=input_shape)
    from tensorflow.keras.layers import Dense, GlobalAveragePooling2D, Lambda
    from tensorflow.keras.models import Model
    import tensorflow.keras.backend as K

    x = GlobalAveragePooling2D()(keras_backbone.output)
    x = Dense(encodings_len // 2, activation="relu", name="head_d1")(x)
    x = Dense(encodings_len, activation="relu", name="head_d2")(x)
    x = Lambda(lambda t: K.l2_normalize(t, axis=1))(x)
    keras_model = Model(inputs=[keras_backbone.input], outputs=[x])

    rng = np.random.default_rng(2)
    raw = rng.uniform(0, 255, size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(raw, verbose=0)

    from embeddingnet_tpu.models.efficientnet import EfficientNet, SCALINGS
    from embeddingnet_tpu.models.heads import EmbeddingHead
    import flax.linen as nn

    w_c, d_c, _ = SCALINGS["efficientnet-b1"]

    class Encoder(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = EfficientNet(width_coefficient=w_c,
                                 depth_coefficient=d_c,
                                 name="backbone")(x, train=False)
            return EmbeddingHead(encodings_len, True, name="head")(feats)

    params, batch_stats = pretrained.keras_efficientnet_to_flax(
        keras_backbone)
    d1_k, d1_b = keras_model.get_layer("head_d1").get_weights()
    d2_k, d2_b = keras_model.get_layer("head_d2").get_weights()
    variables = {
        "params": {"backbone": params,
                   "head": {"dense_1": {"kernel": d1_k, "bias": d1_b},
                            "dense_2": {"kernel": d2_k, "bias": d2_b}}},
        "batch_stats": {"backbone": batch_stats},
    }
    out = np.asarray(Encoder().apply(variables, jnp.asarray(raw / 255.0)))
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-4)


def test_mobilenetv2_backbone_parity():
    """tf.keras MobileNetV2 (random weights, include_top=False) vs our
    Flax MobileNetV2 with ported weights (same [-1,1]-style inputs fed
    to both — keras V2 preprocesses outside the model)."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.MobileNetV2(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(5)
    # randomize BN running stats: with the all-zero/one init the outputs
    # are near-zero and the comparison would be vacuous
    for l in keras_model.layers:
        w = l.get_weights()
        if "BatchNormalization" in l.__class__.__name__ and len(w) == 4:
            w[2] = rng.normal(0, 0.05, w[2].shape).astype(np.float32)
            w[3] = rng.uniform(0.6, 1.4, w[3].shape).astype(np.float32)
            l.set_weights(w)
    x = rng.uniform(-1, 1, size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(x, verbose=0)
    assert np.abs(ref_out).max() > 0.05  # non-vacuous comparison

    from embeddingnet_tpu.models.mobilenet import MobileNetV2
    params, batch_stats = pretrained.keras_mobilenetv2_to_flax(keras_model)
    out = np.asarray(MobileNetV2().apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False))

    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_hf_vit_converter_parity():
    """hf_vit_to_flax vs a live transformers.ViTModel forward (random
    weights, tiny config) — validates the q/k/v/out reshapes, LN mapping,
    patch-conv transpose, and the cls/pos handling."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from embeddingnet_tpu.models import pretrained
    from embeddingnet_tpu.models.vit import ViT

    cfg = transformers.ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.ViTModel(cfg, add_pooling_layer=False).eval()

    sd = dict(hf.state_dict())
    sd = {f"vit.{k}": v for k, v in sd.items()}
    sd["__num_heads__"] = 2
    params = pretrained.hf_vit_to_flax(sd, depth=2)

    module = ViT(patch=8, dim=32, depth=2, heads=2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    ours = module.apply({"params": params}, jnp.asarray(x), train=False)

    with torch.no_grad():
        hf_out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))
                    ).last_hidden_state.numpy()
    gh = gw = 4
    grid = hf_out[:, 1:, :].reshape(2, gh, gw, 32)
    expected = grid + hf_out[:, :1, None, :] / (gh * gw)
    # f32 contraction-order differences (torch sdpa vs XLA einsum)
    np.testing.assert_allclose(np.asarray(ours), expected,
                               rtol=1e-3, atol=1e-4)


def test_densenet121_backbone_parity():
    """keras.applications.DenseNet121 (random weights, include_top=False)
    vs our Flax DenseNet with ported weights."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.DenseNet121(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(2)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.densenet import densenet121
    module = densenet121()
    params, batch_stats = pretrained.keras_densenet_to_flax(
        keras_model, block_sizes=(6, 12, 24, 16))
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_inceptionv3_backbone_parity():
    """keras.applications.InceptionV3 (random weights, include_top=False)
    vs our Flax InceptionV3 — validates the construction-order zip in
    ``keras_inceptionv3_to_flax`` end to end (94 conv+BN pairs)."""
    input_shape = (96, 96, 3)
    keras_model = tf.keras.applications.InceptionV3(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(4)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.inception import InceptionV3
    module = InceptionV3()
    params, batch_stats = pretrained.keras_inceptionv3_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_inception_resnet_v2_backbone_parity():
    """keras.applications.InceptionResNetV2 (random weights,
    include_top=False) vs our Flax InceptionResNetV2 — validates the
    structural-walk converter (244 convs, mixed named/unnamed)."""
    input_shape = (96, 96, 3)
    keras_model = tf.keras.applications.InceptionResNetV2(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(6)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.inception import InceptionResNetV2
    module = InceptionResNetV2()
    params, batch_stats = pretrained.keras_inception_resnet_v2_to_flax(
        keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_mobilenetv1_backbone_parity():
    """keras.applications.MobileNet (v1, random weights) vs our Flax
    MobileNetV1 with order-zipped weights."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.MobileNet(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(5)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.mobilenet import MobileNetV1
    module = MobileNetV1()
    params, batch_stats = pretrained.keras_mobilenetv1_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_vgg16_backbone_parity():
    """keras.applications.VGG16 (random weights) vs our Flax VGG16."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.VGG16(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(3)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.vgg import vgg16
    module = vgg16()
    params = pretrained.keras_vgg_to_flax(keras_model)
    out = np.asarray(module.apply({"params": params},
                                  jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_xception_backbone_parity():
    """keras.applications.Xception (random weights, include_top=False)
    vs our Flax Xception — validates the named main path + creation-order
    shortcut mapping in ``keras_xception_to_flax``."""
    input_shape = (96, 96, 3)
    keras_model = tf.keras.applications.Xception(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(7)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.xception import Xception
    module = Xception()
    params, batch_stats = pretrained.keras_xception_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-5, rtol=1e-3)


def test_nasnetmobile_backbone_parity():
    """keras.applications.NASNetMobile (random weights, include_top=False)
    vs our Flax NASNet-A (4 @ 1056) — validates the cell wiring (adjust
    blocks, correct_pad strided sepconvs, zero-pad pool semantics) and the
    name-walk converter across all 12 cells."""
    input_shape = (64, 64, 3)
    keras_model = tf.keras.applications.NASNetMobile(
        weights=None, include_top=False, input_shape=input_shape)

    rng = np.random.default_rng(8)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.nasnet import nasnetmobile
    module = nasnetmobile()
    params, batch_stats = pretrained.keras_nasnet_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)


def test_nasnet_skip_reduction_parity():
    """The NASNetLarge-specific ``skip_reduction=True`` wiring (the
    post-reduction ``p`` handoff differs from Mobile), on a tiny custom
    NASNet vs the keras builder with the same hyperparameters."""
    from keras.src.applications.nasnet import NASNet as KerasNASNet
    input_shape = (64, 64, 3)
    keras_model = KerasNASNet(
        input_shape, penultimate_filters=96, num_blocks=2,
        stem_block_filters=8, skip_reduction=True,
        include_top=False, weights=None, default_size=64)

    rng = np.random.default_rng(9)
    images = rng.normal(size=(2,) + input_shape).astype(np.float32)
    ref_out = keras_model.predict(images, verbose=0)

    from embeddingnet_tpu.models.nasnet import NASNet
    module = NASNet(penultimate_filters=96, num_blocks=2,
                    stem_block_filters=8, skip_reduction=True)
    params, batch_stats = pretrained.keras_nasnet_to_flax(keras_model)
    out = np.asarray(module.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(images), train=False))
    assert out.shape == ref_out.shape
    np.testing.assert_allclose(out, ref_out, atol=1e-4, rtol=1e-3)


def test_clip_vit_converter_parity():
    """clip_vit_to_flax vs a live transformers.CLIPVisionModelWithProjection
    forward (random weights, tiny config) — validates ln_pre, quick-GELU,
    the bias-free patch conv, class/position embedding layout, and the
    visual projection: token 0 of ``return_tokens=True`` must equal CLIP's
    ``image_embeds`` (visual_projection(post_layernorm(cls)))."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from embeddingnet_tpu.models.vit import ViT

    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu",
        attention_dropout=0.0)
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(cfg).eval()

    sd = dict(hf.state_dict())
    sd["__num_heads__"] = 2
    params = pretrained.clip_vit_to_flax(sd, depth=2)

    module = ViT(patch=8, dim=32, depth=2, heads=2, ln_pre=True,
                 use_quick_gelu=True, patch_bias=False, proj_dim=16,
                 ln_eps=cfg.layer_norm_eps)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    tokens = module.apply({"params": params}, jnp.asarray(x), train=False,
                          return_tokens=True)
    assert tokens.shape == (2, 17, 16)

    with torch.no_grad():
        image_embeds = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))
                          ).image_embeds.numpy()
    np.testing.assert_allclose(np.asarray(tokens[:, 0, :]), image_embeds,
                               rtol=1e-4, atol=1e-5)

    # the 4D backbone contract holds with the projection width
    grid = module.apply({"params": params}, jnp.asarray(x), train=False)
    assert grid.shape == (2, 4, 4, 16)
    assert np.isfinite(np.asarray(grid)).all()
