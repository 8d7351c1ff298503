"""Rotary parity vs the reference implementation (exact, f32)."""

import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.ops import rotary as R


def test_rotary_coordinates_centered(reference_modeling):
    for L in [1, 2, 5, 30, 60, 240]:
        ours = np.asarray(R.get_rotary_coordinates(L, center_origin=True))
        ref = np.asarray(reference_modeling.get_rotary_coordinates(L, center_origin=True))
        np.testing.assert_array_equal(ours, ref)


def test_rotary_coordinates_uncentered(reference_modeling):
    for L in [1, 15, 16]:
        ours = np.asarray(R.get_rotary_coordinates(L, center_origin=False))
        ref = np.asarray(reference_modeling.get_rotary_coordinates(L, center_origin=False))
        np.testing.assert_array_equal(ours, ref)


def test_rotary_coordinates_2d(reference_modeling):
    for h, w in [(12, 20), (18, 32), (24, 24), (6, 10)]:
        ours = np.asarray(R.get_rotary_coordinates_2d(h, w))
        ref = np.asarray(reference_modeling.get_rotary_coordinates_2d(h, w))
        np.testing.assert_array_equal(ours, ref)


def test_multimodal_rotary_coords(reference_modeling):
    rng = np.random.RandomState(0)
    B, L = 3, 17
    h = jnp.asarray(rng.randn(B, L).astype(np.float32))
    seg = jnp.asarray(rng.randint(0, 16, (B, L)).astype(np.float32))
    tok = jnp.asarray(np.tile(np.arange(L, dtype=np.float32), (B, 1)))

    ours = np.asarray(R.multimodal_rotary_coords(h=h, segment_idx=seg, token_idx=tok))
    ref = np.asarray(reference_modeling.multimodal_rotary_coords(
        h=h, segment_idx=seg, token_idx=tok))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_construct_sinusoids(reference_modeling):
    rng = np.random.RandomState(1)
    coords = jnp.asarray(rng.uniform(-1, 1, (2, 9, 4)).astype(np.float32))
    ours = np.asarray(R.construct_rotary_sinusoids(coords, rotary_hsize=32))
    ref = np.asarray(reference_modeling.construct_rotary_sinusoids(coords, rotary_hsize=32))
    assert ours.shape == (2, 2, 9, 32)
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_construct_sinusoids_1d_coords(reference_modeling):
    rng = np.random.RandomState(2)
    coords = jnp.asarray(rng.uniform(-1, 1, (9, 1)).astype(np.float32))
    ours = np.asarray(R.construct_rotary_sinusoids(coords, rotary_hsize=32))
    ref = np.asarray(reference_modeling.construct_rotary_sinusoids(coords, rotary_hsize=32))
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_apply_rotary_quirk(reference_modeling):
    rng = np.random.RandomState(3)
    B, L, H, D = 2, 9, 3, 64
    qk = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (B, L, 4)).astype(np.float32))
    sin = R.construct_rotary_sinusoids(coords)

    ours = np.asarray(R.apply_rotary(qk, sin, sign_quirk=True))
    ref = np.asarray(reference_modeling.apply_rotary(qk, sin))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_apply_rotary_standard_differs():
    """The standard rotation must differ from the quirked one (guards against
    silently losing the flag)."""
    rng = np.random.RandomState(4)
    qk = jnp.asarray(rng.randn(1, 5, 2, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (1, 5, 4)).astype(np.float32))
    sin = R.construct_rotary_sinusoids(coords)
    a = np.asarray(R.apply_rotary(qk, sin, sign_quirk=True))
    b = np.asarray(R.apply_rotary(qk, sin, sign_quirk=False))
    assert np.abs(a - b).max() > 1e-3


def test_apply_rotary_preserves_norm():
    """Any valid rotary keeps per-pair L2 norms (rotation is orthogonal)."""
    rng = np.random.RandomState(5)
    qk = jnp.asarray(rng.randn(1, 7, 2, 64).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1, 1, (1, 7, 4)).astype(np.float32))
    sin = R.construct_rotary_sinusoids(coords)
    out = np.asarray(R.apply_rotary(qk, sin, sign_quirk=False))
    qk_np = np.asarray(qk)
    # standard rotation preserves norm of each (even, odd) pair
    pairs_in = qk_np[..., :32].reshape(1, 7, 2, 16, 2)
    pairs_out = out[..., :32].reshape(1, 7, 2, 16, 2)
    np.testing.assert_allclose(
        np.linalg.norm(pairs_in, axis=-1), np.linalg.norm(pairs_out, axis=-1), atol=1e-5)
