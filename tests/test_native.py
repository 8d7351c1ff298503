"""Native C++ data plane vs the pure-python codec and PIL."""

import io
import os
import time

import numpy as np
import pytest

from merlot_reserve_tpu.data import tfrecord as T
from merlot_reserve_tpu.data import native as N

pytestmark = pytest.mark.skipif(not N.native_available(),
                                reason="native lib unavailable")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = os.path.join(tmp_path_factory.mktemp("native"), "c.tfrecord")
    rng = np.random.RandomState(0)
    records = []
    for i in range(5):
        records.append(T.encode_example({
            "name": T.bytes_feature([f"rec{i}".encode()]),
            "vals": T.float_feature(rng.randn(7).astype(np.float32).tolist()),
            "ids": T.int64_feature(rng.randint(-5, 1000, 11).tolist()),
        }))
    T.write_records(path, records)
    return path


def test_native_reader_matches_python(corpus):
    py = list(T.read_records(corpus, check_crc=True))
    nat = list(N.read_records_native(corpus))
    assert py == nat


def test_native_example_parse(corpus):
    rec = next(iter(T.read_records(corpus)))
    py = T.parse_example(rec)
    ex = N.NativeExample(rec)
    assert ex.bytes_list("name") == py["name"]
    np.testing.assert_allclose(ex.floats("vals"), py["vals"], atol=0)
    np.testing.assert_array_equal(ex.int64s("ids"), py["ids"])


def test_native_jpeg_decode_matches_pil():
    from PIL import Image

    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (60, 80, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=92)
    data = buf.getvalue()

    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    nat = N.decode_jpeg_native(data, channels=3)
    assert nat.shape == pil.shape
    # both use libjpeg; allow tiny IDCT implementation differences
    assert np.abs(nat.astype(int) - pil.astype(int)).mean() < 2.0


def test_native_patchify_shape_and_range():
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (180, 320, 3), dtype=np.uint8)
    patches = N.resize_patchify_native(img, (12, 20))
    assert patches.shape == (240, 768)
    assert 0.0 <= patches.min() and patches.max() <= 1.0

    # close to the host python path (PIL bilinear)
    from merlot_reserve_tpu.data.pretrain_pipeline import host_image_to_patches

    ref = host_image_to_patches(img, (12, 20))
    assert np.abs(patches - ref).mean() < 0.02


def test_native_faster_than_python(corpus):
    rec = next(iter(T.read_records(corpus)))
    t0 = time.perf_counter()
    for _ in range(200):
        T.parse_example(rec)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(200):
        N.NativeExample(rec)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)
