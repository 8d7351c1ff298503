"""Collective audit (parallel/comm.py): the compiled HLO is the source of
truth for what a layout moves over the interconnect. These tests pin the
structural communication contracts of the main layouts — auditable here
precisely because GSPMD (not hand-placed pmap collectives, as in the
reference) emits every transfer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from merlot_reserve_tpu.parallel.comm import (
    collective_summary,
    parse_hlo_collectives,
    summarize_collectives,
)


def test_parse_hlo_text_units():
    hlo = "\n".join([
        "%ar = f32[] all-reduce(%x), replica_groups=[1,4]<=[4]",
        "%ag = bf16[8,64]{1,0} all-gather(%y), dimensions={0}",
        "%cp = f32[2,3]{1,0} collective-permute(%z), "
        "source_target_pairs={{0,1},{1,0}}",
        # async pair: counted once, output buffer (tuple element 1) only
        "%ags = (bf16[4,8]{1,0}, bf16[16,8]{1,0}) all-gather-start(%w)",
        "%agd = bf16[16,8]{1,0} all-gather-done(%ags)",
        # combined (variadic) all-reduce-start: the whole tuple is OUTPUT
        # buffers (no operand alias) -> all elements count
        "%ars = (f32[2]{0}, f32[4]{0}) all-reduce-start(%u, %v)",
        "%ard = (f32[2]{0}, f32[4]{0}) all-reduce-done(%ars)",
        # variadic all-gather-start: ((inputs), (outputs)) -> outputs only
        "%vgs = ((f32[2,8]{1,0}, f32[3,8]{1,0}), (f32[8,8]{1,0}, "
        "f32[12,8]{1,0})) all-gather-start(%x, %y)",
        "%noise = f32[7]{0} add(%a, %b)",
    ])
    recs = parse_hlo_collectives(hlo)
    assert [r["op"] for r in recs] == [
        "all-reduce", "all-gather", "collective-permute", "all-gather",
        "all-reduce", "all-gather"]
    assert recs[0]["bytes"] == 4          # f32 scalar
    assert recs[1]["bytes"] == 8 * 64 * 2
    assert recs[2]["bytes"] == 2 * 3 * 4
    assert recs[3]["bytes"] == 16 * 8 * 2  # output buffer, not operand copy
    assert recs[4]["bytes"] == (2 + 4) * 4
    assert recs[5]["bytes"] == (8 * 8 + 12 * 8) * 4

    s = summarize_collectives(hlo)
    assert s["all-gather"] == {
        "count": 3,
        "bytes": 8 * 64 * 2 + 16 * 8 * 2 + (8 * 8 + 12 * 8) * 4}
    assert s["total_count"] == 6


def test_megascale_and_dcn_split_units():
    """Multi-slice accounting: per-slice modules carry cross-slice traffic
    as MegaScale send/recv transfers, which an HLO-collective-only audit
    misses entirely (round-4 finding on the dcn16 AOT compile)."""
    from merlot_reserve_tpu.parallel.comm import (parse_megascale_transfers,
                                                  split_ici_dcn)

    hlo = "\n".join([
        # intra-slice collective: groups within one slice of 4
        "%ag = bf16[8,64]{1,0} all-gather(%y), replica_groups={{0,1,2,3}},"
        " dimensions={0}",
        # iota form spanning slices: [2,4]<=[8] rows cross the boundary? no
        # — rows are {0..3},{4..7}: within-slice at slice_size=4
        "%ar = f32[16]{0} all-reduce(%x), replica_groups=[2,4]<=[8]",
        # a group genuinely spanning slices
        "%ar2 = f32[4]{0} all-reduce(%x), replica_groups={{0,4},{1,5}}",
        # MegaScale DCN transfer (the real cross-slice path)
        '%send.1 = (bf16[73,8,128]{2,1,0}, u32[], token[]) send(%b, %a), '
        'channel_id=4, is_host_transfer=true, frontend_attributes='
        '{_xla_host_transfer_handler_name="xla_megascale_runtime",'
        'megascale_transfer_type="ALL_REDUCE"}',
    ])
    ms = parse_megascale_transfers(hlo)
    assert len(ms) == 1 and ms[0]["op"] == "megascale_all_reduce"
    assert ms[0]["bytes"] == 73 * 8 * 128 * 2

    from merlot_reserve_tpu.parallel.comm import parse_hlo_collectives
    recs = parse_hlo_collectives(hlo)
    split = split_ici_dcn(recs, slice_size=4, hlo_text=hlo)
    assert split["ici"]["count"] == 2, split
    assert split["dcn"]["count"] == 2, split  # the {0,4} AR + the megascale
    assert split["dcn"]["bytes"] == 4 * 4 + 73 * 8 * 128 * 2, split


@pytest.fixture(scope="module")
def sp_mesh(cpu_devices):
    from merlot_reserve_tpu.parallel.mesh import Mesh

    return Mesh(np.asarray(cpu_devices[:4]), axis_names=("sp",))


def _qkv(seed=0, B=1, L=64, H=4, D=8):
    rng = np.random.RandomState(seed)
    return tuple(jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
                 for _ in range(3))


def test_ring_emits_collective_permutes_only(sp_mesh):
    from merlot_reserve_tpu.ops.ring_attention import (
        sequence_parallel_attention)

    q, k, v = _qkv()
    s = collective_summary(
        lambda q_, k_, v_: sequence_parallel_attention(sp_mesh, q_, k_, v_),
        q, k, v)
    # the K/V rotation is the ring's only collective (inside the hop scan,
    # so it appears once in the HLO regardless of hop count)
    assert s.get("collective-permute", {}).get("count", 0) >= 1, s
    assert "all-to-all" not in s, s


def test_ulysses_emits_all_to_alls_no_permutes(sp_mesh):
    from merlot_reserve_tpu.ops.ring_attention import (
        sequence_parallel_attention)

    q, k, v = _qkv(seed=1)
    s = collective_summary(
        lambda q_, k_, v_: sequence_parallel_attention(
            sp_mesh, q_, k_, v_, impl="ulysses"),
        q, k, v)
    assert s.get("all-to-all", {}).get("count", 0) >= 2, s
    assert "collective-permute" not in s, s


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["dp8", "dp4xtp2"])
def test_zero1_param_traffic_is_bf16(layout):
    """ZeRO-1 wire contract on the REAL TPU compiler (chipless AOT topology
    — the XLA:CPU partitioner fuses the f32->bf16->f32 convert pair
    shard-local and gathers f32, hiding the dtype win, so this contract
    must be pinned against the TPU pipeline): the stored f32 masters are
    dp-sharded and the step gathers a BF16 cast for compute. The HLO must
    contain no param-scale f32 all-gather (the replicated-master design
    reassembled the full f32 param set every step: ~1.35 GiB at base on
    dp8, found by the round-4 pod audit), while bf16 all-gathers cover at
    least one full param set.

    The dp4xtp2 layout pins the round-5 fix: moments of Megatron-sharded
    leaves must carry the SAME tp spec as their masters
    (parallel/sharding.py::opt_state_shardings) — misaligned (dp-only)
    moments made the partitioner reshard f32 master-sized buffers through
    the optimizer update (192 MiB f32 all-gathers on the large dp4xtp2
    AOT compile)."""
    try:
        from jax.experimental import topologies
        topo = topologies.get_topology_desc(platform="tpu",
                                            topology_name="v5e:2x4")
    except Exception as e:  # no libtpu / unsupported in this env
        pytest.skip(f"TPU AOT topology unavailable: {e}")

    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.parallel.comm import parse_hlo_collectives
    from merlot_reserve_tpu.parallel.mesh import activate_mesh
    from merlot_reserve_tpu.parallel.sharding import (batch_sharding,
                                                      state_shardings)
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=True)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=8, seed=0, num_text_spans=16)
    params = jax.eval_shape(model.init_params, batch)
    state = jax.eval_shape(
        lambda p: construct_train_state(cfg.optimizer, model, p), params)

    mesh = (make_mesh(dp=8, devices=list(topo.devices)) if layout == "dp8"
            else make_mesh(dp=4, tp=2, devices=list(topo.devices)))
    s_sh = state_shardings(mesh, state, zero1=True)
    b_sh = batch_sharding(mesh)
    state_sds = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
        state, s_sh)
    batch_sds = {k: jax.ShapeDtypeStruct(np.asarray(v).shape,
                                         np.asarray(v).dtype, sharding=b_sh)
                 for k, v in batch.items()}
    jitted = jax.jit(train_step,
                     out_shardings=(s_sh, NamedSharding(mesh, P())),
                     donate_argnums=(0,))
    with activate_mesh(mesh):
        hlo = jitted.lower(state_sds, batch_sds).compile().as_text()
    recs = parse_hlo_collectives(hlo)

    param_bytes_f32 = 4 * sum(
        x.size for x in jax.tree_util.tree_leaves(params))
    ag_f32 = sum(r["bytes"] for r in recs
                 if r["op"] == "all-gather" and "f32" in r["shape"])
    ag_bf16 = sum(r["bytes"] for r in recs
                  if r["op"] == "all-gather" and "bf16" in r["shape"])
    # f32 gathers may exist for small non-dp-shardable leaves / metrics,
    # but nothing near a full param reassembly
    assert ag_f32 < 0.2 * param_bytes_f32, (ag_f32, param_bytes_f32)
    # under tp only the non-tp-sharded remainder is ZeRO-gathered; still
    # expect a meaningful bf16 gather volume and no f32 reassembly
    min_bf16 = 0.8 if layout == "dp8" else 0.3
    assert ag_bf16 >= min_bf16 * (param_bytes_f32 // 2), (
        ag_bf16, param_bytes_f32)


@pytest.mark.slow
def test_dp_train_step_moves_grad_bytes(cpu_devices):
    """dp-only training: the interconnect carries (at least) one full set
    of bf16 grads per step, and the grad reduction DOMINATES the traffic.

    GSPMD is free to reshard small intermediates with collective-permute /
    all-to-all even in a pure-dp program (e.g. batch-dim transposes around
    the cross-batch Gumbel top-k), so their *presence* is not a contract
    violation — their *size* is: resharding noise must stay a small
    fraction of the grad bytes."""
    import merlot_reserve_tpu as mr
    from merlot_reserve_tpu.data.dummy import make_dummy_batch
    from merlot_reserve_tpu.models import MerlotReservePretrainer
    from merlot_reserve_tpu.parallel import make_mesh
    from merlot_reserve_tpu.training.optimization import construct_train_state
    from merlot_reserve_tpu.training.trainer import make_jit_train_step

    cfg = mr.load_config("base", hidden_size=64, joint_num_layers=2,
                         vit_num_layers=2, audio_num_layers=2,
                         span_num_layers=2, size_per_head=32,
                         output_grid=(4, 4), use_bfloat16=False)
    cfg = cfg.replace_data(num_segments=4, num_segment_groups=2, seq_len=80,
                           lang_seq_len=40, num_text_spans_to_include=8)
    model = MerlotReservePretrainer.from_config(cfg)
    batch = make_dummy_batch(cfg, batch_size=4, seed=0, num_text_spans=16)
    params = model.init_params(batch)
    state = construct_train_state(cfg.optimizer, model, params)

    mesh = make_mesh(dp=4, devices=cpu_devices[:4])
    step_fn, dstate = make_jit_train_step(mesh, state, zero1=False,
                                          donate=False)
    bd = {k: jnp.asarray(v) for k, v in batch.items()}
    s = collective_summary(step_fn, dstate, bd, mesh=mesh)

    n_param_bytes_bf16 = 2 * sum(
        x.size for x in jax.tree_util.tree_leaves(params))
    reduced = (s.get("all-reduce", {}).get("bytes", 0)
               + s.get("reduce-scatter", {}).get("bytes", 0))
    assert reduced >= 0.8 * n_param_bytes_bf16, (reduced, n_param_bytes_bf16, s)
    reshard = (s.get("collective-permute", {}).get("bytes", 0)
               + s.get("all-to-all", {}).get("bytes", 0))
    assert reshard <= 0.2 * reduced, (reshard, reduced, s)
