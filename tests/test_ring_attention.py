"""Ring attention (sequence parallelism) vs full attention on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.ops.attention import make_attention_bias, xla_attention
from merlot_reserve_tpu.ops.ring_attention import sequence_parallel_attention
from merlot_reserve_tpu.parallel.mesh import Mesh


@pytest.fixture(scope="module")
def sp_mesh(cpu_devices):
    return Mesh(np.asarray(cpu_devices[:4]), axis_names=("sp",))


def test_ring_matches_full(sp_mesh):
    rng = np.random.RandomState(0)
    B, L, H, D = 2, 64, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(rng.randint(0, 2, (B, L)))

    out_ring = sequence_parallel_attention(sp_mesh, q, k, v, valid, segs)
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ring_no_mask(sp_mesh):
    rng = np.random.RandomState(1)
    B, L, H, D = 1, 32, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    out_ring = sequence_parallel_attention(sp_mesh, q, k, v)
    out_full = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=2e-5)


@pytest.mark.slow
def test_ring_is_differentiable(sp_mesh):
    rng = np.random.RandomState(2)
    B, L, H, D = 1, 32, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))

    def loss_ring(q_):
        return (sequence_parallel_attention(sp_mesh, q_, k, v) ** 2).sum()

    def loss_full(q_):
        return (xla_attention(q_, k, v) ** 2).sum()

    g_ring = jax.grad(loss_ring)(q)
    g_full = jax.grad(loss_full)(q)
    np.testing.assert_allclose(np.asarray(g_ring), np.asarray(g_full), atol=3e-4)


def test_ring_flash_matches_lax_and_full(sp_mesh):
    """Pallas ring (flash kernel per step + overlapped ppermute) vs the lax
    ring and vs single-device full attention, packed segments + padding."""
    rng = np.random.RandomState(3)
    B, L, H, D = 2, 128, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 3, (B, L)), -1))

    out_flash = sequence_parallel_attention(
        sp_mesh, q, k, v, valid, segs, impl="flash", interpret=True)
    out_lax = sequence_parallel_attention(sp_mesh, q, k, v, valid, segs)
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_flash) * mask,
                               np.asarray(out_lax) * mask, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_flash) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ring_flash_packed_video_blocks(sp_mesh):
    """Packed-video block-diagonal masking across shard boundaries: outputs
    at VALID query positions must match full attention exactly. (Outputs at
    invalid query positions are undefined by contract in every impl — the
    joint transformer masks them downstream.)"""
    rng = np.random.RandomState(4)
    B, L, H, D = 1, 128, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = np.ones((B, L), bool)
    valid[0, 110:] = False  # tail padding
    # three packed videos whose boundaries don't align with the 4 shards
    segs = np.zeros((B, L), np.int32)
    segs[0, 37:91] = 1
    segs[0, 91:] = 2

    out_flash = np.asarray(sequence_parallel_attention(
        sp_mesh, q, k, v, jnp.asarray(valid), jnp.asarray(segs),
        impl="flash", interpret=True))
    out_full = np.asarray(xla_attention(
        q, k, v, make_attention_bias(is_valid=jnp.asarray(valid),
                                     segment_ids=jnp.asarray(segs))))
    mask = valid[..., None, None]
    np.testing.assert_allclose(out_flash * mask, out_full * mask, atol=2e-5)


def test_ring_rdma_matches_full(sp_mesh):
    """In-kernel RDMA ring (single Pallas kernel, double-buffered remote
    DMA, capacity-semaphore backpressure) vs full attention — interpret
    mode simulates the inter-device DMA + semaphores faithfully."""
    rng = np.random.RandomState(5)
    B, L, H, D = 2, 128, 2, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 3, (B, L)), -1))

    out_rdma = sequence_parallel_attention(
        sp_mesh, q, k, v, valid, segs, impl="rdma", interpret=True)
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_rdma) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)
