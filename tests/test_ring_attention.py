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


@pytest.mark.slow  # 37s; the packed-video flash ring test covers it fast
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


def test_ring_flash_is_differentiable(sp_mesh):
    """ring:flash custom VJP — the backward ring (dk/dv accumulators riding
    with their shard, Pallas backward kernels per hop against the merged
    out/lse) must reproduce dense-attention grads for q, k AND v at every
    valid position. k/v grads exercise the grads-come-home final ppermute;
    packed segments + an invalid tail exercise the cross-label masking."""
    rng = np.random.RandomState(7)
    B, L, H, D = 1, 64, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid_np = np.ones((B, L), bool)
    valid_np[0, 56:] = False
    valid = jnp.asarray(valid_np)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))
    # weight the loss by the valid mask: outputs at invalid query rows are
    # undefined by contract (every impl computes SOMETHING there), so no
    # cotangent may flow back through them
    w = jnp.asarray(valid_np.astype(np.float32))[..., None, None]

    def loss_ring(q_, k_, v_):
        out = sequence_parallel_attention(sp_mesh, q_, k_, v_, valid, segs,
                                          impl="flash", interpret=True)
        return ((out * w) ** 2).sum()

    def loss_full(q_, k_, v_):
        out = xla_attention(q_, k_, v_, make_attention_bias(
            is_valid=valid, segment_ids=segs))
        return ((out * w) ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_full, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf), atol=3e-4,
                                   err_msg=f"d{name} mismatch")


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


@pytest.mark.slow  # 34s; ulysses encoder variant keeps fast coverage
def test_encoder_ring_impl_matches_dense(sp_mesh):
    """Model-level wiring: TransformerEncoder(attention_impl='ring',
    seq_shard_axis='sp') under an active mesh must match the dense XLA
    encoder exactly at valid positions — the 'ring' impl string is the
    production knob (ModelConfig.joint_attention_impl='ring') that turns
    GSPMD dense attention into true ring attention over the sp axis."""
    import jax

    from merlot_reserve_tpu.models.layers import TransformerEncoder
    from merlot_reserve_tpu.parallel.mesh import activate_mesh

    rng = np.random.RandomState(6)
    B, L, H = 2, 64, 64
    kw = dict(hidden_size=H, num_layers=2, size_per_head=16, rotary_hsize=8)
    enc_dense = TransformerEncoder(**kw)
    enc_ring = TransformerEncoder(attention_impl="ring",
                                  seq_shard_axis="sp", **kw)
    x = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    coords = jnp.asarray(
        np.broadcast_to(np.arange(L, dtype=np.float32)[None, :, None],
                        (B, L, 1)))
    valid = np.ones((B, L), bool)
    valid[0, 50:] = False
    valid = jnp.asarray(valid)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    params = enc_dense.init(jax.random.PRNGKey(0), x, rotary_coords=coords,
                            is_valid=valid, segment_ids=segs)
    out_dense = enc_dense.apply(params, x, rotary_coords=coords,
                                is_valid=valid, segment_ids=segs)["seq"]

    with activate_mesh(sp_mesh):
        out_ring = jax.jit(
            lambda p, x_: enc_ring.apply(p, x_, rotary_coords=coords,
                                         is_valid=valid,
                                         segment_ids=segs)["seq"]
        )(params, x)

    mask = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_dense) * mask,
                               atol=3e-5, rtol=1e-5)

    # grads flow through the lax ring (training path)
    def loss(fn_enc, p):
        def f(p_):
            o = fn_enc.apply(p_, x, rotary_coords=coords, is_valid=valid,
                             segment_ids=segs)["seq"]
            return (jnp.where(mask, o, 0.0) ** 2).sum()
        return jax.grad(f)(p)

    g_dense = loss(enc_dense, params)
    with activate_mesh(sp_mesh):
        g_ring = jax.jit(lambda p: loss(enc_ring, p))(params)
    for a, b in zip(jax.tree.leaves(g_ring), jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_ring_impl_falls_back_without_mesh():
    """joint_attention_impl='ring' must still run single-chip (no active
    mesh): attention() degenerates to the dense path."""
    from merlot_reserve_tpu.ops.attention import attention

    rng = np.random.RandomState(7)
    B, L, H, D = 1, 32, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    out_ring = attention(q, k, v, is_valid=valid, impl="ring")
    out_xla = attention(q, k, v, is_valid=valid, impl="xla")
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_xla),
                               atol=0, rtol=0)


def test_ring_dp_sp_combined_mesh(cpu_devices):
    """On a dp x sp mesh the batch dim shards over dp inside the ring's
    shard_map (no redundant all-gathered batch per dp shard) and results
    still match full attention."""
    mesh = Mesh(np.asarray(cpu_devices[:8]).reshape(2, 4),
                axis_names=("dp", "sp"))
    rng = np.random.RandomState(8)
    B, L, H, D = 4, 64, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    out_ring = sequence_parallel_attention(mesh, q, k, v, valid, segs)
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ring_dcn_hybrid_mesh(cpu_devices):
    """ring x dcn_dp (support-matrix cell): on a 2-slice hybrid mesh the
    batch spans ("dcn", "dp") inside the ring's shard_map (batch_axes) and
    the K/V rotations stay on the intra-slice sp axis."""
    from merlot_reserve_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, sp=2, dcn_dp=2, devices=cpu_devices[:8])
    rng = np.random.RandomState(20)
    B, L, H, D = 4, 64, 2, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    out_ring = sequence_parallel_attention(mesh, q, k, v, valid, segs)
    out_u = sequence_parallel_attention(mesh, q, k, v, valid, segs,
                                        impl="ulysses")
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ring_tp_sharded_heads(cpu_devices):
    """tp x ring composition (round 4): on a dp x sp x tp mesh the head dim
    shards over tp inside the ring's shard_map — each tp shard rings only
    its own Megatron head slice (parallel/sharding.py qkv specs) instead of
    all-gathering and computing every head redundantly. Output must still
    match full attention."""
    mesh = Mesh(np.asarray(cpu_devices[:8]).reshape(2, 2, 2),
                axis_names=("dp", "sp", "tp"))
    rng = np.random.RandomState(16)
    B, L, H, D = 4, 64, 4, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    out_ring = sequence_parallel_attention(mesh, q, k, v, valid, segs)
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)

    # structural: the shard-local ring body must see H/tp = 2 heads — a
    # [B/dp, L/sp, 4, D] body input means the heads were all-gathered
    jaxpr = jax.make_jaxpr(
        lambda q_, k_, v_: sequence_parallel_attention(mesh, q_, k_, v_,
                                                       valid, segs))(q, k, v)
    shmaps = [e for e in _walk_jaxpr_eqns(jaxpr.jaxpr)
              if e.primitive.name == "shard_map"]
    assert shmaps, "expected a shard_map in the ring jaxpr"
    body_q = shmaps[0].params["jaxpr"].invars[0].aval.shape
    assert tuple(body_q) == (B // 2, L // 2, H // 2, D), body_q

    # tp_heads=False override (advisor r4): a caller whose q/k/v are NOT
    # Megatron-sharded opts out of the head split — the body sees all H
    # heads (replicated over tp, no entry-split/exit-gather collectives)
    # and the result is unchanged
    out_rep = sequence_parallel_attention(mesh, q, k, v, valid, segs,
                                          tp_heads=False)
    np.testing.assert_allclose(np.asarray(out_rep) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)
    jaxpr2 = jax.make_jaxpr(
        lambda q_, k_, v_: sequence_parallel_attention(
            mesh, q_, k_, v_, valid, segs, tp_heads=False))(q, k, v)
    shmaps2 = [e for e in _walk_jaxpr_eqns(jaxpr2.jaxpr)
               if e.primitive.name == "shard_map"]
    body_q2 = shmaps2[0].params["jaxpr"].invars[0].aval.shape
    assert tuple(body_q2) == (B // 2, L // 2, H, D), body_q2


def test_ulysses_tp_sharded_heads(cpu_devices):
    """tp x ulysses: local heads (H/tp) split again over the sp axis by the
    all_to_all; with H=8, tp=2, sp=2 each device runs 2 full-sequence
    heads."""
    mesh = Mesh(np.asarray(cpu_devices[:8]).reshape(2, 2, 2),
                axis_names=("dp", "sp", "tp"))
    rng = np.random.RandomState(17)
    B, L, H, D = 4, 64, 8, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    out_u = sequence_parallel_attention(mesh, q, k, v, valid, segs,
                                        impl="ulysses")
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ulysses_tp_local_head_divisibility(cpu_devices):
    """the divisibility guard counts LOCAL (post-tp) heads: 4 heads / tp2 =
    2 local heads cannot split over sp=4."""
    mesh = Mesh(np.asarray(cpu_devices[:8]).reshape(4, 2),
                axis_names=("sp", "tp"))
    rng = np.random.RandomState(18)
    q = jnp.asarray(rng.randn(1, 32, 4, 8).astype(np.float32))
    with pytest.raises(AssertionError, match="2 local heads"):
        sequence_parallel_attention(mesh, q, q, q, impl="ulysses")


def test_encoder_ring_with_tp_sharded_params(cpu_devices):
    """Full Megatron x ring stack: encoder params tp-sharded by
    param_shardings' Megatron specs, activations seq-sharded over sp, ring
    attention ringing each tp shard's own heads — matches the dense
    single-device encoder at valid positions."""
    from merlot_reserve_tpu.models.layers import TransformerEncoder
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import param_shardings

    mesh = make_mesh(dp=2, sp=2, tp=2, devices=cpu_devices[:8])
    rng = np.random.RandomState(19)
    B, L, H = 4, 64, 64  # 4 heads of 16: 2 per tp shard
    kw = dict(hidden_size=H, num_layers=2, size_per_head=16, rotary_hsize=8)
    enc_dense = TransformerEncoder(**kw)
    enc_ring = TransformerEncoder(attention_impl="ring",
                                  seq_shard_axis="sp", **kw)
    x = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    coords = jnp.asarray(
        np.broadcast_to(np.arange(L, dtype=np.float32)[None, :, None],
                        (B, L, 1)))
    valid = np.ones((B, L), bool)
    valid[0, 50:] = False
    valid = jnp.asarray(valid)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    params = enc_dense.init(jax.random.PRNGKey(0), x, rotary_coords=coords,
                            is_valid=valid, segment_ids=segs)
    out_dense = enc_dense.apply(params, x, rotary_coords=coords,
                                is_valid=valid, segment_ids=segs)["seq"]

    sh = param_shardings(mesh, params)
    p_tp = jax.device_put(params, sh)
    with activate_mesh(mesh):
        out_ring = jax.jit(
            lambda p, x_: enc_ring.apply(p, x_, rotary_coords=coords,
                                         is_valid=valid,
                                         segment_ids=segs)["seq"]
        )(p_tp, x)
    mask = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(out_ring) * mask,
                               np.asarray(out_dense) * mask,
                               atol=3e-5, rtol=1e-5)


def _walk_jaxpr_eqns(jaxpr):
    for eqn in jaxpr.eqns:
        yield eqn
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for sub in vs:
                # params hold either raw Jaxprs (shard_map) or ClosedJaxprs
                inner = sub if hasattr(sub, "eqns") else getattr(sub, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    yield from _walk_jaxpr_eqns(inner)


def test_ring_scan_drops_last_hop(sp_mesh):
    """The ring runs n-1 rotations + a merge-only epilogue: the n-th
    ppermute would only feed the discarded final carry, and XLA cannot DCE
    collectives inside a scan body. Structural check on the jaxpr: every
    scan whose body rotates (contains ppermute) has length n-1."""
    rng = np.random.RandomState(9)
    B, L, H, D = 1, 32, 2, 8
    args = [jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
            for _ in range(3)]
    n = sp_mesh.shape["sp"]

    jaxpr = jax.make_jaxpr(
        lambda q, k, v: sequence_parallel_attention(sp_mesh, q, k, v))(*args)
    ring_scans = []
    for eqn in _walk_jaxpr_eqns(jaxpr.jaxpr):
        if eqn.primitive.name == "scan":
            body = eqn.params["jaxpr"].jaxpr
            prims = {e.primitive.name for e in _walk_jaxpr_eqns(body)}
            if "ppermute" in prims:
                ring_scans.append(eqn.params["length"])
    assert ring_scans, "expected a ppermute-rotating scan in the ring jaxpr"
    assert all(length == n - 1 for length in ring_scans), ring_scans


# ---------------------------------------------------------------------------
# Ulysses (all_to_all head sharding)
# ---------------------------------------------------------------------------


def test_ulysses_matches_full(sp_mesh):
    """Head-sharded all_to_all sequence parallelism vs full attention,
    packed segments + padding. H=4 heads over 4 shards = 1 head/device."""
    rng = np.random.RandomState(10)
    B, L, H, D = 2, 64, 4, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 3, (B, L)), -1))

    out_u = sequence_parallel_attention(sp_mesh, q, k, v, valid, segs,
                                        impl="ulysses")
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ulysses_flash_inner_matches_full(sp_mesh):
    """ulysses-flash: the Pallas kernel (interpret mode) runs the local
    full-sequence attention after the head swap."""
    rng = np.random.RandomState(11)
    B, L, H, D = 1, 128, 4, 16
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = np.ones((B, L), bool)
    valid[0, 100:] = False
    segs = np.zeros((B, L), np.int32)
    segs[0, 51:] = 1  # boundary off the shard grid

    out_u = sequence_parallel_attention(
        sp_mesh, q, k, v, jnp.asarray(valid), jnp.asarray(segs),
        impl="ulysses-flash", interpret=True)
    out_full = xla_attention(
        q, k, v, make_attention_bias(is_valid=jnp.asarray(valid),
                                     segment_ids=jnp.asarray(segs)))
    mask = valid[..., None, None]
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_ulysses_is_differentiable(sp_mesh):
    """Unlike the per-hop flash ring (fwd-only merge), ulysses differentiates:
    all_to_all transposes to all_to_all and the inner attention has AD."""
    rng = np.random.RandomState(12)
    B, L, H, D = 1, 32, 4, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))

    def loss_u(q_):
        return (sequence_parallel_attention(sp_mesh, q_, k, v,
                                            impl="ulysses") ** 2).sum()

    def loss_full(q_):
        return (xla_attention(q_, k, v) ** 2).sum()

    g_u = jax.grad(loss_u)(q)
    g_full = jax.grad(loss_full)(q)
    np.testing.assert_allclose(np.asarray(g_u), np.asarray(g_full), atol=3e-4)


def test_ulysses_head_divisibility_asserts(sp_mesh):
    rng = np.random.RandomState(13)
    B, L, H, D = 1, 32, 3, 8  # 3 heads over 4 shards
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    with pytest.raises(AssertionError, match="not divisible"):
        sequence_parallel_attention(sp_mesh, q, q, q, impl="ulysses")


def test_ulysses_dp_sp_combined_mesh(cpu_devices):
    """dp x sp: batch shards over dp inside the shard_map (same guard as the
    ring) and the all_to_all stays on the sp axis."""
    mesh = Mesh(np.asarray(cpu_devices[:8]).reshape(2, 4),
                axis_names=("dp", "sp"))
    rng = np.random.RandomState(14)
    B, L, H, D = 4, 64, 4, 8
    q = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
    valid = jnp.asarray(rng.rand(B, L) > 0.2)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    out_u = sequence_parallel_attention(mesh, q, k, v, valid, segs,
                                        impl="ulysses")
    out_full = xla_attention(q, k, v, make_attention_bias(is_valid=valid,
                                                          segment_ids=segs))
    mask = np.asarray(valid)[..., None, None]
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_full) * mask, atol=2e-5)


def test_encoder_ulysses_impl_matches_dense(sp_mesh):
    """Model-level knob: TransformerEncoder(attention_impl='ulysses',
    seq_shard_axis='sp') under an active mesh matches the dense encoder, and
    grads flow (the training path — ulysses is the differentiable SP choice
    when heads divide the axis)."""
    import jax as _jax

    from merlot_reserve_tpu.models.layers import TransformerEncoder
    from merlot_reserve_tpu.parallel.mesh import activate_mesh

    rng = np.random.RandomState(15)
    B, L, H = 2, 64, 64  # 4 heads of 16 over the 4-way sp axis
    kw = dict(hidden_size=H, num_layers=2, size_per_head=16, rotary_hsize=8)
    enc_dense = TransformerEncoder(**kw)
    enc_u = TransformerEncoder(attention_impl="ulysses",
                               seq_shard_axis="sp", **kw)
    x = jnp.asarray(rng.randn(B, L, H).astype(np.float32))
    coords = jnp.asarray(
        np.broadcast_to(np.arange(L, dtype=np.float32)[None, :, None],
                        (B, L, 1)))
    valid = np.ones((B, L), bool)
    valid[0, 50:] = False
    valid = jnp.asarray(valid)
    segs = jnp.asarray(np.sort(rng.randint(0, 2, (B, L)), -1))

    params = enc_dense.init(_jax.random.PRNGKey(0), x, rotary_coords=coords,
                            is_valid=valid, segment_ids=segs)
    out_dense = enc_dense.apply(params, x, rotary_coords=coords,
                                is_valid=valid, segment_ids=segs)["seq"]
    with activate_mesh(sp_mesh):
        out_u = _jax.jit(
            lambda p, x_: enc_u.apply(p, x_, rotary_coords=coords,
                                      is_valid=valid,
                                      segment_ids=segs)["seq"]
        )(params, x)
    mask = np.asarray(valid)[..., None]
    np.testing.assert_allclose(np.asarray(out_u) * mask,
                               np.asarray(out_dense) * mask,
                               atol=3e-5, rtol=1e-5)

    def grads(fn_enc, p, jit_mesh):
        def f(p_):
            o = fn_enc.apply(p_, x, rotary_coords=coords, is_valid=valid,
                             segment_ids=segs)["seq"]
            return (jnp.where(mask, o, 0.0) ** 2).sum()
        if jit_mesh is None:
            return _jax.grad(f)(p)
        with activate_mesh(jit_mesh):
            return _jax.jit(_jax.grad(f))(p)

    g_dense = grads(enc_dense, params, None)
    g_u = grads(enc_u, params, sp_mesh)
    for a, b in zip(_jax.tree.leaves(g_u), _jax.tree.leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
