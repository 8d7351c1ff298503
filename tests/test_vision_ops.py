"""Vision preprocessing parity vs the reference's TF implementation."""

import numpy as np
import pytest

from merlot_reserve_tpu.ops import vision as V


@pytest.fixture(scope="module")
def tf_reference():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import tensorflow as tf

    tf.config.experimental.set_visible_devices([], "GPU")
    from pretrain import data_utils as ref_data_utils

    return tf, ref_data_utils


@pytest.fixture(scope="module")
def image():
    rng = np.random.RandomState(0)
    return rng.randint(0, 256, (360, 640, 3), dtype=np.uint8)


def test_space_to_depth_matches_tf(tf_reference, image):
    tf, _ = tf_reference
    img = image[:352, :, :].astype(np.float32) / 255.0  # 352x640 divisible by 16
    ref = tf.nn.space_to_depth(img[None], 16, data_format="NHWC")
    ref = np.asarray(ref).reshape(-1, 16 * 16 * 3)
    ours = np.asarray(V.space_to_depth(img, 16))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_depth_to_space_roundtrip(image):
    img = (image[:352, :, :].astype(np.float32)) / 255.0
    patches = V.space_to_depth(img, 16)
    back = V.depth_to_space(patches, (22, 40), 16)
    np.testing.assert_allclose(np.asarray(back), img, atol=1e-6)


def test_resize_and_pad_matches_tf(tf_reference, image):
    tf, ref_du = tf_reference
    img_f = tf.image.convert_image_dtype(image, dtype=tf.float32)
    ref_img, ref_info = ref_du.resize_and_pad(
        img_f, (12 * 16, 20 * 16), do_random_scale=False, do_flip_if_vertical=False,
        resize_method="bilinear")
    ours, info = V.resize_and_pad(np.asarray(img_f), (12 * 16, 20 * 16))
    # bilinear+antialias implementations differ at boundary taps; allow small error
    err = np.abs(np.asarray(ours) - np.asarray(ref_img))
    assert err.max() < 0.04, f"max abs err {err.max()}"
    assert err.mean() < 0.004
    np.testing.assert_allclose(np.asarray(info)[:3], np.asarray(ref_info)[:3], atol=1e-5)


def test_preprocess_image_to_patches_shape(image):
    patches = V.preprocess_image_to_patches(image, (12, 20))
    assert patches.shape == (240, 768)
    assert 0.0 <= float(np.asarray(patches).min()) and float(np.asarray(patches).max()) <= 1.0


def test_patches_close_to_reference_pipeline(tf_reference, image):
    """End-to-end: our on-device patchify vs the reference's TF pipeline
    (preprocess.py:464-481)."""
    tf, ref_du = tf_reference
    img = tf.image.convert_image_dtype(image, dtype=tf.float32)
    ref_resized, _ = ref_du.resize_and_pad(img, (192, 320), do_random_scale=False,
                                           do_flip_if_vertical=False,
                                           resize_method="bilinear")
    ref_patches = tf.nn.space_to_depth(ref_resized[None], 16, data_format="NHWC")
    ref_patches = np.asarray(tf.reshape(ref_patches, [12 * 20, 768]))

    ours = np.asarray(V.preprocess_image_to_patches(image, (12, 20)))
    assert np.abs(ours - ref_patches).mean() < 0.004


def test_batch_preprocess(image):
    batch = np.stack([image, image])
    patches = V.batch_preprocess_images(batch, (12, 20))
    assert patches.shape == (2, 240, 768)
