"""TFRecord + tf.Example codec: round trip and cross-check against
TensorFlow's own writer/parser."""

import os

import numpy as np
import pytest

from merlot_reserve_tpu.data import tfrecord as T


def test_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "test.tfrecord")
    ex = T.encode_example({
        "img": T.bytes_feature([b"\x01\x02\x03"]),
        "vals": T.float_feature([1.5, -2.25, 3.0]),
        "ids": T.int64_feature([7, -3, 1 << 40]),
    })
    T.write_records(path, [ex, ex])
    recs = list(T.read_records(path, check_crc=True))
    assert len(recs) == 2
    parsed = T.parse_example(recs[0])
    assert parsed["img"] == [b"\x01\x02\x03"]
    np.testing.assert_allclose(parsed["vals"], [1.5, -2.25, 3.0])
    np.testing.assert_array_equal(parsed["ids"], [7, -3, 1 << 40])


def test_parse_tf_written_record(tmp_path):
    """Our parser must read records written by TensorFlow itself."""
    tf = pytest.importorskip("tensorflow")
    path = os.path.join(tmp_path, "tfw.tfrecord")
    ex = tf.train.Example(features=tf.train.Features(feature={
        "s": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"hello", b"world"])),
        "f": tf.train.Feature(float_list=tf.train.FloatList(value=[0.5, 1.25])),
        "i": tf.train.Feature(int64_list=tf.train.Int64List(value=[42, -1])),
    }))
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    recs = list(T.read_records(path, check_crc=True))
    parsed = T.parse_example(recs[0])
    assert parsed["s"] == [b"hello", b"world"]
    np.testing.assert_allclose(parsed["f"], [0.5, 1.25])
    np.testing.assert_array_equal(parsed["i"], [42, -1])


def test_tf_parses_our_record(tmp_path):
    """TensorFlow must read records written by our codec."""
    tf = pytest.importorskip("tensorflow")
    path = os.path.join(tmp_path, "ours.tfrecord")
    ex = T.encode_example({
        "s": T.bytes_feature([b"abc"]),
        "f": T.float_feature([3.75]),
        "i": T.int64_feature([-99, 5]),
    })
    T.write_records(path, [ex])
    raw = next(iter(tf.data.TFRecordDataset(path)))
    parsed = tf.io.parse_single_example(raw, {
        "s": tf.io.VarLenFeature(tf.string),
        "f": tf.io.VarLenFeature(tf.float32),
        "i": tf.io.VarLenFeature(tf.int64),
    })
    assert parsed["s"].values.numpy().tolist() == [b"abc"]
    np.testing.assert_allclose(parsed["f"].values.numpy(), [3.75])
    np.testing.assert_array_equal(parsed["i"].values.numpy(), [-99, 5])


def test_shuffling_writer(tmp_path):
    from merlot_reserve_tpu.data.tfrecord import ShufflingRecordWriter

    path = os.path.join(tmp_path, "shuf.tfrecord")
    recs = [T.encode_example({"i": T.int64_feature([i])}) for i in range(50)]
    with ShufflingRecordWriter(path, buffer_size=16, seed=1) as w:
        for r in recs:
            w.write(r)
    out = [int(T.parse_example(r)["i"][0]) for r in T.read_records(path, check_crc=True)]
    assert sorted(out) == list(range(50))
    assert out != list(range(50))  # actually shuffled
