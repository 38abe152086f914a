"""Config-parser round-trip tests over reference-shaped YAML files
(``configs/road_signs_apollo.yml`` / ``configs/template.yml`` schemas)."""

import textwrap

import pytest

from embeddingnet_tpu.config import ConfigError, parse_params, params_from_dict


REFERENCE_STYLE_YAML = textwrap.dedent("""
    MODEL:
      input_shape :  [48, 48, 3]
      encodings_len: 256
      mode : 'triplet'
      distance_type : 'l1'
      backbone_name : 'simple'
      backbone_weights : 'imagenet'
      freeze_backbone : False
      embeddings_normalization: True

    DATALOADER:
      dataset_path : '/data/RTSD/'
      train_csv_file : '/data/RTSD/split_1/train.csv'
      val_csv_file : '/data/RTSD/split_1/val.csv'
      image_id_column : 'file_path'
      label_column : 'class_name'
      validate : True
      val_ratio : 0.2

    GENERATOR:
      negatives_selection_mode : 'semihard'
      k_classes: 20
      k_samples: 3
      margin: 0.5
      batch_size : 8
      n_batches : 500
      augmentations : 'none'

    TRAIN:
      optimizer : 'radam'
      learning_rate : 0.001
      decay_factor : 0.1
      step_size : 5
      n_epochs : 1000
      plot_history : True

    ENCODINGS:
      save_encodings : True
      centers_only: False
      max_num_samples_of_each_class : 30
      knn_k : 1

    GENERAL:
      project_name : 'road_signs_efnb1'
      work_dir : 'work_dirs/'
      tensorboard_callback: False
      wandb_callback: False
""")


@pytest.fixture
def ref_config(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text(REFERENCE_STYLE_YAML)
    return str(p)


def test_parse_reference_schema(ref_config):
    params = parse_params(ref_config)
    assert params.model.input_shape == (48, 48, 3)
    assert params.model.encodings_len == 256
    assert params.generator.k_classes == 20
    assert params.generator.margin == 0.5
    assert params.train.optimizer == "radam"
    assert params.encodings.knn_k == 1
    assert params.general.project_name == "road_signs_efnb1"
    # injected like utils.py:176
    assert params.generator.input_shape == (48, 48, 3)
    # 'none' normalizes to no augmentation
    assert params.generator.augmentations is None


def test_mapping_protocol_compat(ref_config):
    """Reference call sites index params like dicts (tools/train.py:56-59)."""
    params = parse_params(ref_config)
    assert params["model"]["mode"] == "triplet"
    assert params["generator"]["batch_size"] == 8
    assert params["train"]["learning_rate"] == 0.001
    # reference idiom (tools/train.py:164): key absent when no section
    assert "softmax" not in params
    assert params.softmax is None


def test_csv_file_alias():
    """template.yml:13 uses csv_file instead of train_csv_file."""
    params = params_from_dict({
        "DATALOADER": {"dataset_path": "/d", "csv_file": "/d/train.csv"},
    })
    assert params.dataloader.train_csv_file == "/d/train.csv"


def test_augmentation_type_alias():
    """Fixes the reference's augmentations_type/augmentation_type quirk
    (utils.py:160-161)."""
    params = params_from_dict({
        "GENERATOR": {"augmentation_type": "default", "k_classes": 3,
                      "k_samples": 3},
    })
    assert params.generator.augmentations == "default"


def test_softmax_section_optional():
    params = params_from_dict({
        "SOFTMAX_PRETRAINING": {"optimizer": "adam", "learning_rate": 0.01,
                                "n_epochs": 2},
        "MODEL": {"input_shape": [32, 32, 3]},
    })
    assert "softmax" in params  # present exactly when the section exists
    assert params.softmax is not None
    assert params.softmax.optimizer == "adam"
    assert params.softmax.input_shape == (32, 32, 3)


def test_mesh_and_performance_defaults():
    params = params_from_dict({})
    assert params.mesh.data == 1  # parallelism is opt-in (like ref gpu_ids)
    assert params.mesh.model == 1
    assert params.performance.compute_dtype == "bfloat16"


def test_validation_errors():
    with pytest.raises(ConfigError):
        params_from_dict({"MODEL": {"mode": "quadruplet"}})
    with pytest.raises(ConfigError):
        params_from_dict({"TRAIN": {"optimizer": "lion"}})
    with pytest.raises(ConfigError):
        params_from_dict({"GENERATOR": {"negatives_selection_mode": "bogus"}})
    with pytest.raises(ConfigError):
        params_from_dict({"MODEL": {"input_shape": [48, 48]}})
    with pytest.raises(ConfigError):
        params_from_dict({"MODEL": {"unknown_key": 1}})


def test_every_shipped_config_parses():
    """The configs/ fleet (BASELINE.json's five experiments) stays loadable."""
    import glob
    import os
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = sorted(glob.glob(os.path.join(repo_root, "configs", "*.yml")))
    assert len(configs) >= 5
    for path in configs:
        params = parse_params(path)
        assert params.model.backbone_name  # parsed + validated
