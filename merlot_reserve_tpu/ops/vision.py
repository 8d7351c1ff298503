"""On-device image preprocessing: resize + pad + patchify.

Replaces the reference's TF host ops (/root/reference/pretrain/
data_utils.py:42-147 ``resize_and_pad`` and mreserve/preprocess.py:464-481
``preprocess_image_to_patches``) with JAX so a raw frame goes
decode -> patches -> ViT on one device program.

Semantics (inference path): aspect-preserving bilinear+antialias resize to
fit the target box, clip to [0,1], zero-pad bottom/right, then a
space_to_depth with P=16 producing [grid_h*grid_w, 768] — bit-for-bit the
tf.nn.space_to_depth channel order.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(img, patch_size: int = 16):
    """[H, W, C] -> [(H/P)*(W/P), P*P*C] in tf.nn.space_to_depth order."""
    *lead, H, W, C = img.shape
    P = patch_size
    assert H % P == 0 and W % P == 0
    x = img.reshape(*lead, H // P, P, W // P, P, C)
    x = jnp.swapaxes(x, -4, -3)  # [.., h, w, P, P, C]
    return x.reshape(*lead, (H // P) * (W // P), P * P * C)


def depth_to_space(patches, grid: Tuple[int, int], patch_size: int = 16, channels: int = 3):
    """Inverse of space_to_depth (debug/visualization)."""
    h, w = grid
    P = patch_size
    *lead, hw, ppc = patches.shape
    assert hw == h * w and ppc == P * P * channels
    x = patches.reshape(*lead, h, w, P, P, channels)
    x = jnp.swapaxes(x, -4, -3)
    return x.reshape(*lead, h * P, w * P, channels)


@partial(jax.jit, static_argnames=("output_size",))
def resize_and_pad(image, output_size: Tuple[int, int]):
    """Aspect-preserving resize into (dh, dw) + bottom/right zero pad.

    :param image: [H, W, 3] float in [0, 1]
    :return: ([dh, dw, 3], image_info[7]) — info layout matches the reference
             (effective h/w fractions, 1/scale, orig h, orig w, offsets).
    """
    dh, dw = output_size
    h, w = image.shape[0], image.shape[1]
    scale = min(dh / h, dw / w)
    sh, sw = int(h * scale), int(w * scale)

    resized = jax.image.resize(image, (sh, sw, image.shape[2]), method="bilinear",
                               antialias=True)
    resized = jnp.clip(resized, 0.0, 1.0)
    out = jnp.zeros((dh, dw, image.shape[2]), resized.dtype)
    out = out.at[:sh, :sw].set(resized)

    info = jnp.asarray([sh / dh, sw / dw, 1.0 / scale, float(h), float(w), 0.0, 0.0],
                       dtype=jnp.float32)
    return out, info


def preprocess_image_to_patches(img, output_grid_size: Tuple[int, int],
                                patch_size: int = 16):
    """uint8/float [H, W, 3] -> [grid_h*grid_w, P*P*3] float32 patches
    (preprocess.py:464-481 surface)."""
    h1, w1 = output_grid_size
    if img.dtype == jnp.uint8 or (hasattr(img, "dtype") and img.dtype == np.uint8):
        img = img.astype(jnp.float32) / 255.0
    else:
        img = img.astype(jnp.float32)
    img, _info = resize_and_pad(img, (h1 * patch_size, w1 * patch_size))
    return space_to_depth(img, patch_size)


def batch_preprocess_images(imgs, output_grid_size: Tuple[int, int],
                            patch_size: int = 16):
    """[B, H, W, 3] (same raw size) -> [B, grid_h*grid_w, P*P*3]."""
    return jax.vmap(lambda im: preprocess_image_to_patches(
        im, output_grid_size, patch_size))(imgs)
