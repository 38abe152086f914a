"""Pure-Python tfevents writer verified against TensorFlow's own reader
(ROADMAP "TensorBoard event files without the TF dependency")."""

import math

import pytest

from embeddingnet_tpu.utils.tb_writer import (TBEventWriter, _crc32c,
                                              _varint)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"123456789") == 0xE3069283


def test_varint():
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(300) == b"\xac\x02"


def test_events_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")
    w = TBEventWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 1)
    w.add_scalar("loss", 0.25, 2)
    w.add_scalar("val_recall1", 0.875, 2)
    w.close()

    events = list(tf.compat.v1.train.summary_iterator(w.path))
    assert events[0].file_version == "brain.Event:2"
    scalars = [(e.step, v.tag, v.simple_value)
               for e in events[1:] for v in e.summary.value]
    assert (1, "loss", 0.5) in scalars
    assert (2, "val_recall1", 0.875) in scalars
    got_loss2 = [s for s in scalars if s[:2] == (2, "loss")][0]
    assert math.isclose(got_loss2[2], 0.25)
    # wall times populated
    assert all(e.wall_time > 0 for e in events)


def test_metrics_logger_tensorboard_path(tmp_path):
    from embeddingnet_tpu.utils.logging import MetricsLogger
    logger = MetricsLogger(str(tmp_path), tensorboard=True)
    logger.log(0, {"loss": 1.0, "images_per_sec": 100.0})
    logger.log(1, {"loss": 0.5})
    logger.close()
    files = [f for f in tmp_path.iterdir() if "tfevents" in f.name]
    assert files and files[0].stat().st_size > 50
