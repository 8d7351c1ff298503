"""On-device TRAINING frame preprocessing.

flip-if-vertical + random-scale resize (six Pillow-convention kernels) +
random crop + zero-pad + patchify as ONE fixed-shape device program — the
last host-side float math in the training data plane moves in-graph. The
reference does all of this with host TF ops (/root/reference/pretrain/
dataloader.py:63-85 ``load_and_resize_img``; /root/reference/pretrain/
data_utils.py:42-147 ``resize_and_pad``, :8-23
``apply_with_random_selector``, :25-39 ``flip_if_vertical``); the host now
only decodes JPEG bytes into a fixed square uint8 buffer.

Design notes (TPU-first):

* A resize whose scale/offset/kernel are TRACED values cannot use
  ``jax.image.resize`` (static output shapes only). Instead each axis's
  resampling is a dense ``[dst, src_max]`` weight matrix built in-graph
  from Pillow's antialiased coefficient-window algorithm — the same
  convention as the native host plane's ``mn_resize_patchify_k``
  (native/merlot_native.cc:371-537) — and the resize becomes two
  MXU matmuls: ``out = W_y @ (W_x @ img^T)^T``. At base shapes this is
  ~0.5 GFLOP/frame, noise next to the model step.
* All six PIL filters (BICUBIC, BILINEAR, BOX, HAMMING, LANCZOS, NEAREST —
  ``pil_resize_methods()`` order) are evaluated elementwise and the traced
  kernel id selects one; the weight tensor is tiny ([dst, src] per axis) so
  computing all candidates costs nothing.
* ``flip_if_vertical`` is data-dependent (portrait frames rotate 90° and
  gain 4px gray side markers) but shape-static here: the frame lives in a
  square [FB, FB] buffer, rotation is a transpose + row gather, and the
  marker/pad layout is a pair of column masks.

Parity: with the SAME draw values (scale multiplier, kernel id, crop
offsets) this matches ``mn_resize_patchify_k`` to f32 accumulation noise
and the PIL host path to its uint8 fixed-point rounding
(tests/test_vision_train.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# filter support radii in pil_resize_methods() order; NEAREST (id 5) is a
# single-tap special case (native/merlot_native.cc:403-412)
_SUPPORT = (2.0, 1.0, 0.5, 1.0, 3.0, 0.0)
NUM_KERNELS = 6
BILINEAR = 1  # the no-augmentation default kernel


def _filter_values(kernel, x):
    """Pillow filter value at signed distance ``x`` (filter units) for the
    traced ``kernel`` id (0..4; NEAREST handled by the caller). Mirrors
    mn_filter (native/merlot_native.cc:371-401)."""
    ax = jnp.abs(x)
    a = -0.5  # Keys bicubic, Pillow's BICUBIC
    bicubic = jnp.where(
        ax < 1.0, ((a + 2.0) * ax - (a + 3.0)) * ax * ax + 1.0,
        jnp.where(ax < 2.0, (((ax - 5.0) * ax + 8.0) * ax - 4.0) * a, 0.0))
    bilinear = jnp.maximum(1.0 - ax, 0.0)
    box = ((x > -0.5) & (x <= 0.5)).astype(x.dtype)
    pix = jnp.where(ax == 0.0, 1.0, jnp.pi * ax)  # safe denominator
    sinc = jnp.sin(pix) / pix
    hamming = jnp.where(
        ax >= 1.0, 0.0,
        jnp.where(ax == 0.0, 1.0, sinc * (0.54 + 0.46 * jnp.cos(pix))))
    px3 = pix / 3.0
    lanczos = jnp.where(
        ax >= 3.0, 0.0,
        jnp.where(ax == 0.0, 1.0, sinc * jnp.sin(px3) / px3))
    stacked = jnp.stack([bicubic, bilinear, box, hamming, lanczos], 0)
    return stacked[jnp.clip(kernel, 0, 4)]


def resample_weights(kernel, in_size, out_full, out_lo, out_valid,
                     src_max: int, dst_size: int):
    """One axis's Pillow-convention resampling matrix ``[dst_size, src_max]``.

    Traced scalars: ``kernel`` (0..5), ``in_size`` (true source extent
    inside the src_max buffer), ``out_full`` (full resized extent before
    cropping), ``out_lo`` (crop offset), ``out_valid`` (rows of the output
    canvas that receive content; the rest stay zero — the pad region).
    Mirrors mn_precompute (native/merlot_native.cc:422-459)."""
    in_size = in_size.astype(jnp.float32)
    out_full = jnp.maximum(out_full.astype(jnp.float32), 1.0)
    ratio = in_size / out_full
    filterscale = jnp.maximum(ratio, 1.0)
    support = jnp.asarray(_SUPPORT)[jnp.clip(kernel, 0, 5)] * filterscale

    i = jnp.arange(dst_size, dtype=jnp.float32)
    center = (out_lo.astype(jnp.float32) + i + 0.5) * ratio       # [dst]
    xmn = jnp.maximum(jnp.floor(center - support + 0.5), 0.0)
    xmx = jnp.minimum(jnp.floor(center + support + 0.5), in_size)

    x = jnp.arange(src_max, dtype=jnp.float32)[None, :]           # [1, src]
    arg = (x - center[:, None] + 0.5) / filterscale
    w = _filter_values(kernel, arg)
    w = jnp.where((x >= xmn[:, None]) & (x < xmx[:, None]), w, 0.0)

    # NEAREST: one tap at the (truncated) sample point
    x0 = jnp.clip(jnp.floor(center), 0.0, in_size - 1.0)
    w = jnp.where(kernel == 5, (x == x0[:, None]).astype(jnp.float32), w)

    total = w.sum(-1, keepdims=True)
    w = w / jnp.where(total == 0.0, 1.0, total)
    return jnp.where(i[:, None] < out_valid, w, 0.0)


def resize_patchify(img, h, w, grid: Tuple[int, int], mult, kernel,
                    off_y, off_x, patch: int = 16):
    """[FB, FB, 3] float buffer (0..255), true extent (h, w) -> patches
    [grid_h*grid_w, patch*patch*3] in [0, 1].

    The device twin of mn_resize_patchify_k (native/merlot_native.cc:
    461-537) / host_image_to_patches (data/pretrain_pipeline.py:70-103):
    aspect-preserving resize into the grid box scaled by ``mult``, crop at
    (off_y, off_x), zero-pad bottom/right, tf.nn.space_to_depth layout."""
    gh, gw = grid
    dh, dw = gh * patch, gw * patch
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    scale = jnp.minimum(dh / hf, dw / wf) * mult
    sh_full = jnp.floor(hf * scale)
    sw_full = jnp.floor(wf * scale)
    sh = jnp.minimum(sh_full - off_y, float(dh))
    sw = jnp.minimum(sw_full - off_x, float(dw))

    wy = resample_weights(kernel, h, sh_full, off_y, sh, img.shape[0], dh)
    wx = resample_weights(kernel, w, sw_full, off_x, sw, img.shape[1], dw)

    # horizontal pass first, then vertical — the native op's order
    tmp = jnp.einsum("xw,hwc->hxc", wx, img)
    out = jnp.einsum("yh,hxc->yxc", wy, tmp)
    out = jnp.clip(out * (1.0 / 255.0), 0.0, 1.0)
    return out.reshape(gh, patch, gw, patch, 3).swapaxes(1, 2).reshape(
        gh * gw, patch * patch * 3)


def flip_if_vertical(img, h, w):
    """Device twin of data_utils.py:25-39 / pretrain_pipeline.py:46-54:
    portrait frames (h >= 4w/3) rotate 90° CCW and gain 4px 0.5-gray side
    markers. ``img`` is a SQUARE [FB, FB, 3] float buffer (0..255 scale)
    with true extent (h, w); returns (img', h', w')."""
    fb = img.shape[0]
    assert img.shape[1] == fb, "flip needs a square frame buffer"
    flip = h.astype(jnp.float32) >= 4.0 * w.astype(jnp.float32) / 3.0

    # rot90(img)[a, b] = img[b, w-1-a]: transpose then gather rows
    t = jnp.swapaxes(img, 0, 1)
    rows = jnp.arange(fb)
    rot = t[jnp.clip(w - 1 - rows, 0, fb - 1)]
    # shift content 4 px right; 4px markers at cols [0,4) and [h+4, h+8)
    cols = jnp.arange(fb)
    shifted = rot[:, jnp.clip(cols - 4, 0, fb - 1)]
    is_marker = (cols < 4) | ((cols >= h + 4) & (cols < h + 8))
    in_content = (cols >= 4) & (cols < h + 4) & (rows[:, None] < w)
    flipped = jnp.where(is_marker[None, :, None], 128.0,
                        jnp.where(in_content[:, :, None], shifted, 0.0))

    out = jnp.where(flip, flipped, img)
    h2 = jnp.where(flip, w, h)
    w2 = jnp.where(flip, h + 8, w)
    return out, h2, w2


def draw_augmentations(key, h, w, grid: Tuple[int, int],
                       scale_range: Tuple[float, float],
                       random_resize_method: bool = True,
                       patch: int = 16) -> Dict[str, jnp.ndarray]:
    """In-graph draw of one frame's augmentation parameters, matching the
    host decode_image draw semantics (data/pretrain_pipeline.py:182-218):
    mult ~ U[scale_range], kernel ~ U{0..5} (or BILINEAR), integer crop
    offsets uniform over the overhang."""
    gh, gw = grid
    dh, dw = gh * patch, gw * patch
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mult = jax.random.uniform(k1, (), minval=scale_range[0],
                              maxval=scale_range[1])
    if random_resize_method:
        kernel = jax.random.randint(k2, (), 0, NUM_KERNELS)
    else:
        kernel = jnp.asarray(BILINEAR, jnp.int32)
    hf = h.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    scale = jnp.minimum(dh / hf, dw / wf) * mult
    max_oy = jnp.maximum(jnp.floor(hf * scale) - dh, 0.0)
    max_ox = jnp.maximum(jnp.floor(wf * scale) - dw, 0.0)
    off_y = jnp.floor(jax.random.uniform(k3) * (max_oy + 1.0))
    off_x = jnp.floor(jax.random.uniform(k4) * (max_ox + 1.0))
    return {"mult": mult, "kernel": kernel, "off_y": off_y, "off_x": off_x}


def augment_frames(key, frames_u8, frame_hw, grid: Tuple[int, int],
                   scale_range: Tuple[float, float],
                   random_resize_method: bool = True, patch: int = 16,
                   draws: Optional[Dict[str, jnp.ndarray]] = None):
    """One example's frames, fully on device: [S, FB, FB, 3] uint8 buffers +
    [S, 2] true (h, w) -> [S, grid_h*grid_w, patch*patch*3] float32 patches
    with per-frame flip / random scale / random kernel / random crop.

    ``draws``: optional explicit per-frame {mult, kernel, off_y, off_x}
    arrays ([S]-shaped) replacing the in-graph RNG — the parity-test hook
    (host decode_image consumes its numpy RNG in the same order)."""
    S = frames_u8.shape[0]

    def one(k, img, hw, d):
        img = img.astype(jnp.float32)
        img, h, w = flip_if_vertical(img, hw[0], hw[1])
        if d is None:
            d = draw_augmentations(k, h, w, grid, scale_range,
                                   random_resize_method, patch)
        return resize_patchify(img, h, w, grid, d["mult"], d["kernel"],
                               d["off_y"], d["off_x"], patch)

    keys = jax.random.split(key, S)
    if draws is None:
        return jax.vmap(lambda k, im, hw: one(k, im, hw, None))(
            keys, frames_u8, frame_hw)
    return jax.vmap(lambda k, im, hw, *dv: one(
        k, im, hw, dict(zip(("mult", "kernel", "off_y", "off_x"), dv))))(
        keys, frames_u8, frame_hw, draws["mult"], draws["kernel"],
        draws["off_y"], draws["off_x"])
