"""On-device training-frame preprocessing (ops/vision_train.py) vs the host
paths: the native PIL-convention resampler (exact-ish, float vs float) and
PIL itself (uint8 fixed-point tolerance), plus the loader/builder wiring.

Reference semantics being mirrored: /root/reference/pretrain/
dataloader.py:63-85 (load_and_resize_img), data_utils.py:42-147
(resize_and_pad + random method), :25-39 (flip_if_vertical).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import merlot_reserve_tpu as mr
from merlot_reserve_tpu.data import native as N
from merlot_reserve_tpu.data.pretrain_pipeline import (
    flip_if_vertical as host_flip,
    host_image_to_patches,
    parse_segment_record,
    pil_resize_methods,
)
from merlot_reserve_tpu.data.synthetic import write_synthetic_corpus
from merlot_reserve_tpu.data.tfrecord import read_records
from merlot_reserve_tpu.ops import vision_train as VT

FB = 328  # covers the synthetic corpus's 180x320 frames (+8 flip margin)


def _to_buffer(img: np.ndarray, fb: int = FB):
    buf = np.zeros((fb, fb, 3), np.uint8)
    h, w = img.shape[:2]
    buf[:h, :w] = img
    return buf, np.asarray([h, w], np.int32)


@pytest.fixture(scope="module")
def cfg():
    c = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                       vit_num_layers=2, audio_num_layers=2, span_num_layers=2,
                       size_per_head=32, output_grid=(4, 4),
                       use_bfloat16=False)
    return c.replace_data(num_segments=8, num_segment_groups=2, seq_len=168,
                          lang_seq_len=48, num_text_spans_to_include=8,
                          text_span_budget=10, frame_buffer_size=FB,
                          on_device_frames=True)


def test_resize_patchify_matches_native_all_kernels():
    if not N.native_available():
        pytest.skip("native plane unavailable")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(200, 300, 3)).astype(np.uint8)
    buf, hw = _to_buffer(img)
    for kernel in range(6):
        for mult, oy, ox in [(1.0, 0, 0), (1.08, 3, 5), (1.3, 10, 2)]:
            ref = N.resize_patchify_native(img, (6, 8), scale_mult=mult,
                                           off_y=oy, off_x=ox, kernel=kernel)
            dev = VT.resize_patchify(
                jnp.asarray(buf, jnp.float32), jnp.int32(hw[0]),
                jnp.int32(hw[1]), (6, 8), jnp.float32(mult),
                jnp.int32(kernel), jnp.float32(oy), jnp.float32(ox))
            err = np.abs(np.asarray(dev) - ref).max()
            assert err < 2e-4, (kernel, mult, oy, ox, err)


def test_resize_patchify_matches_pil():
    """Against PIL itself (the host fallback): tolerance is PIL's uint8
    per-pass rounding, same budget as the native-vs-PIL test."""
    from PIL import Image

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, size=(200, 300, 3)).astype(np.uint8)
    buf, hw = _to_buffer(img)
    grid = (6, 8)
    dh, dw = grid[0] * 16, grid[1] * 16
    h, w = img.shape[:2]
    scale = min(dh / h, dw / w)
    sh, sw = max(int(h * scale), 1), max(int(w * scale), 1)
    for kernel, method in enumerate(pil_resize_methods()):
        resized = np.asarray(Image.fromarray(img).resize((sw, sh), method),
                             np.float32) / 255.0
        out = np.zeros((dh, dw, 3), np.float32)
        out[:sh, :sw] = resized
        ref = out.reshape(grid[0], 16, grid[1], 16, 3).swapaxes(1, 2)
        ref = ref.reshape(grid[0] * grid[1], 16 * 16 * 3)
        dev = np.asarray(VT.resize_patchify(
            jnp.asarray(buf, jnp.float32), jnp.int32(h), jnp.int32(w), grid,
            jnp.float32(1.0), jnp.int32(kernel), jnp.float32(0),
            jnp.float32(0)))
        err = np.abs(dev - ref)
        tol_mean = 0.02 if method == Image.Resampling.NEAREST else 0.01
        assert err.mean() < tol_mean, (method, err.mean())
        assert (err < 0.05).mean() > 0.95, (method, (err < 0.05).mean())


def test_flip_if_vertical_device_parity():
    rng = np.random.default_rng(2)
    for h, w in [(280, 150), (150, 280), (200, 150), (160, 120)]:
        img = rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)
        buf, _ = _to_buffer(img)
        out, h2, w2 = VT.flip_if_vertical(jnp.asarray(buf, jnp.float32),
                                          jnp.int32(h), jnp.int32(w))
        ref = host_flip(img)
        assert (int(h2), int(w2)) == ref.shape[:2], (h, w)
        got = np.asarray(out)
        np.testing.assert_array_equal(
            got[:int(h2), :int(w2)].astype(np.uint8), ref)
        # everything beyond the true extent that the resampler could read
        # must be zero (the resample weights mask x < in_size, but rows of
        # the flipped buffer below w' are reachable only through bugs)
        assert got[:int(h2), int(w2):].max() == 0.0


def test_augment_frames_pinned_draws_match_host_decode(cfg):
    """The END-TO-END parity gate: with the SAME draw values the device path
    reproduces the host decode_image (which consumes its numpy RNG in the
    order mult, kernel, off_y, off_x — data/pretrain_pipeline.py:182-218),
    including the flip."""
    from merlot_reserve_tpu.data.pretrain_pipeline import PretrainExampleBuilder

    host_builder = PretrainExampleBuilder(cfg)
    d = cfg.data
    grid = tuple(cfg.model.output_grid)
    dh, dw = grid[0] * 16, grid[1] * 16
    rng = np.random.default_rng(3)
    shapes = [(180, 320), (320, 180), (200, 129), (96, 128)]
    imgs = [rng.integers(0, 255, size=s + (3,)).astype(np.uint8)
            for s in shapes]

    bufs, hws, host_out, draws = [], [], [], {
        "mult": [], "kernel": [], "off_y": [], "off_x": []}
    for i, img in enumerate(imgs):
        seg_rng = np.random.default_rng((7, i))
        from io import BytesIO
        from PIL import Image

        bio = BytesIO()
        Image.fromarray(img).save(bio, format="PNG")  # lossless round trip
        # drive decode_image's logic directly on the raw array instead of
        # JPEG bytes: replicate its draw order with a twin RNG
        twin = np.random.default_rng((7, i))
        flipped = host_flip(img)
        h, w = flipped.shape[:2]
        mult = float(twin.uniform(d.random_scale_min, d.random_scale_max))
        kernel = int(twin.integers(0, 6)) if d.random_resize_method else 1
        scale = min(dh / h, dw / w) * mult
        sh, sw = int(h * scale), int(w * scale)
        off_y = int(twin.integers(0, max(sh - dh, 0) + 1))
        off_x = int(twin.integers(0, max(sw - dw, 0) + 1))
        if N.native_available():
            host_out.append(N.resize_patchify_native(
                flipped, grid, scale_mult=mult, off_y=off_y, off_x=off_x,
                kernel=kernel))
        else:
            host_out.append(None)
        del seg_rng
        buf, hw = _to_buffer(img)
        bufs.append(buf)
        hws.append(hw)
        draws["mult"].append(mult)
        draws["kernel"].append(kernel)
        draws["off_y"].append(off_y)
        draws["off_x"].append(off_x)

    dev = np.asarray(VT.augment_frames(
        jax.random.PRNGKey(0), jnp.asarray(np.stack(bufs)),
        jnp.asarray(np.stack(hws)), grid,
        (d.random_scale_min, d.random_scale_max), d.random_resize_method,
        draws={k: jnp.asarray(np.asarray(v, np.float32)
                              if k != "kernel" else np.asarray(v, np.int32))
               for k, v in draws.items()}))
    if not N.native_available():
        pytest.skip("native plane unavailable for the exact host twin")
    for i in range(len(imgs)):
        err = np.abs(dev[i] - host_out[i]).max()
        assert err < 2e-4, (i, shapes[i], draws["kernel"][i], err)


@pytest.mark.slow  # 57s full-builder jit; kernel parity tests stay fast
def test_device_builder_on_device_frames(cfg, tmp_path):
    """host_prepare_frames + build_batch: images come out of the ONE jit
    with collated shape/range, and the non-image streams are bit-identical
    to a frameless build with the same key."""
    from merlot_reserve_tpu.data.device_builder import (DeviceExampleBuilder,
                                                        stack_raw_examples)

    path = os.path.join(str(tmp_path), "c.tfrecord")
    write_synthetic_corpus(path, cfg, num_records=2, seed=0)
    recs = list(read_records(path))
    builder = DeviceExampleBuilder(cfg)
    raws = []
    for r in recs:
        segs = parse_segment_record(r, cfg.data.num_segments)
        raw = builder.host_prepare(segs)
        raw.update(builder.host_prepare_frames(segs))
        raws.append(raw)
    raw_batch = jax.tree.map(jnp.asarray, stack_raw_examples(raws))
    key = jax.random.PRNGKey(5)
    batch = builder.build_batch(key, raw_batch)
    S, hw = cfg.data.num_segments, cfg.model.vit_seq_len
    assert batch["images"].shape == (2, S * hw, 16 * 16 * 3)
    imgs = np.asarray(batch["images"])
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0 and imgs.max() > 0.05

    frameless = {k: v for k, v in raw_batch.items()
                 if k not in ("frames_u8", "frame_hw")}
    base = builder.build_batch(key, frameless)
    for k in base:
        np.testing.assert_array_equal(np.asarray(base[k]),
                                      np.asarray(batch[k]), err_msg=k)


@pytest.mark.slow  # 36s loader-level; fused-step test covers the wiring
def test_device_loader_on_device_frames(cfg, tmp_path):
    """DevicePretrainLoader(on_device_frames): batches carry device-built
    images; the fused variant yields raw frames for in-graph assembly."""
    from merlot_reserve_tpu.data.loader import DevicePretrainLoader

    path = os.path.join(str(tmp_path), "c.tfrecord")
    write_synthetic_corpus(path, cfg, num_records=4, seed=1)
    loader = DevicePretrainLoader([path], cfg, batch_size=2, seed=11,
                                  num_workers=2, repeat=False)
    assert loader.on_device_frames
    batch = next(iter(loader))
    S, hw = cfg.data.num_segments, cfg.model.vit_seq_len
    assert batch["images"].shape == (2, S * hw, 768)
    assert "frames_u8" not in batch

    fused = DevicePretrainLoader([path], cfg, batch_size=2, seed=11,
                                 num_workers=2, repeat=False, fused=True)
    raw = next(iter(fused))
    FBc = cfg.data.frame_buffer_size
    assert raw["frames_u8"].shape == (2, S, FBc, FBc, 3)
    assert raw["frames_u8"].dtype == np.uint8
    assert raw["frame_hw"].shape == (2, S, 2)
    assert "images" not in raw
