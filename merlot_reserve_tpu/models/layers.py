"""Transformer building blocks.

Module/param naming is a compatibility surface: the flax param tree must map
1:1 onto gs://merlotreserve checkpoints (qkv / attn_proj / pre_attn_ln /
pre_mlp_ln / attention_layer / mlp_layer / layer_NN / pre_ln / final_ln /
cls / cls_proj / intermediate / out), mirroring
/root/reference/mreserve/modeling.py:205-376. The computation itself is
TPU-first: attention masks are carried as per-position (is_valid,
segment_ids) labels and expanded inside the attention op (Pallas flash path
streams them; no [B, L, L] tensor ever hits HBM on that path).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

import merlot_reserve_tpu.ops.attention as attn_ops
from merlot_reserve_tpu.ops import rotary as rotary_ops


def kernel_init(key, shape, dtype=jnp.float32):
    """Depth-scaled truncated-normal init: stddev = min(18/in, 0.02)/sqrt(2),
    with DenseGeneral's 3D kernels resolving `in` per modeling.py:147-186."""
    if len(shape) == 2:
        in_size = shape[-2]
    elif len(shape) == 3:
        in_size = shape[0]
        out_size = shape[2]
        if in_size < out_size:
            in_size *= shape[1]
    else:
        in_size = shape[-2]
    stddev = min(18.0 / in_size, 0.02) / np.sqrt(2)
    return jax.random.truncated_normal(key, -2, 2, shape, dtype) * stddev


def my_gelu(x):
    """Sigmoid-approx GELU with the 1.702 constant (modeling.py:240-241)."""
    return x * nn.sigmoid(1.702 * x)


class AttentionLayer(nn.Module):
    """Self-attention with fused QKV projection and rotary applied to the
    concatenated query+key block (modeling.py:205-237)."""

    hidden_size: int = 768
    size_per_head: int = 64
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    rotary_sign_quirk: bool = True

    @nn.compact
    def __call__(self, x, *, sinusoids=None, is_valid=None, segment_ids=None,
                 attention_bias=None):
        *batch_dims, seq_len, hidden_size = x.shape
        assert self.hidden_size % self.size_per_head == 0
        num_heads = self.hidden_size // self.size_per_head

        qkv = nn.DenseGeneral(
            features=(3 * num_heads, self.size_per_head), axis=-1,
            dtype=self.dtype, kernel_init=kernel_init, name="qkv")(x)

        query_key, value = jnp.split(qkv, [2 * num_heads], axis=-2)
        if sinusoids is not None:
            query_key = rotary_ops.apply_rotary(query_key, sinusoids,
                                                sign_quirk=self.rotary_sign_quirk)
        query, key = jnp.split(query_key, [num_heads], axis=-2)

        # attention() wants [B, L, H, D]; collapse any extra batch dims.
        if len(batch_dims) != 1:
            flat_b = int(np.prod(batch_dims)) if batch_dims else 1
            query = query.reshape(flat_b, seq_len, num_heads, self.size_per_head)
            key = key.reshape(flat_b, seq_len, num_heads, self.size_per_head)
            value = value.reshape(flat_b, seq_len, num_heads, self.size_per_head)
            if is_valid is not None:
                is_valid = is_valid.reshape(flat_b, seq_len)
            if segment_ids is not None:
                segment_ids = segment_ids.reshape(flat_b, seq_len)
            if attention_bias is not None:
                attention_bias = attention_bias.reshape(
                    (flat_b,) + attention_bias.shape[len(batch_dims):])

        x_att = attn_ops.attention(
            query, key, value,
            is_valid=is_valid, segment_ids=segment_ids, bias=attention_bias,
            impl=self.attention_impl)

        if len(batch_dims) != 1:
            x_att = x_att.reshape(*batch_dims, seq_len, num_heads, self.size_per_head)

        return nn.DenseGeneral(
            features=self.hidden_size, axis=(-2, -1), kernel_init=kernel_init,
            dtype=self.dtype, name="attn_proj", use_bias=False)(x_att)


class MLPBlock(nn.Module):
    dtype: Any = jnp.float32
    expansion_mult: int = 4

    @nn.compact
    def __call__(self, x):
        hidden_size = x.shape[-1]
        x1 = nn.Dense(features=hidden_size * self.expansion_mult, dtype=self.dtype,
                      kernel_init=kernel_init, name="intermediate")(x)
        x1 = my_gelu(x1)
        return nn.Dense(features=hidden_size, dtype=self.dtype, kernel_init=kernel_init,
                        name="out", use_bias=False)(x1)


class TransformerLayer(nn.Module):
    hidden_size: int
    expansion_mult: int = 4
    size_per_head: int = 64
    dtype: Any = jnp.float32
    attention_impl: str = "auto"
    rotary_sign_quirk: bool = True
    # scan_format=True makes __call__ return (x, None) so the module drops
    # straight into nn.scan
    scan_format: bool = False

    @nn.compact
    def __call__(self, x, sinusoids=None, is_valid=None, segment_ids=None,
                 attention_bias=None):
        assert x.shape[-1] == self.hidden_size
        x_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_attn_ln")(x)
        x += AttentionLayer(
            hidden_size=self.hidden_size, dtype=self.dtype,
            size_per_head=self.size_per_head, attention_impl=self.attention_impl,
            rotary_sign_quirk=self.rotary_sign_quirk, name="attention_layer")(
            x_ln, sinusoids=sinusoids, is_valid=is_valid, segment_ids=segment_ids,
            attention_bias=attention_bias)

        x_ln2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_mlp_ln")(x)
        x += MLPBlock(expansion_mult=self.expansion_mult, dtype=self.dtype,
                      name="mlp_layer")(x_ln2)
        if self.scan_format:
            return x, None
        return x


def resolve_remat_policy(name):
    """Map a config string to a jax.checkpoint policy callable.

    Names are exactly the ``jax.checkpoint_policies`` attributes
    ('dots_saveable', 'dots_with_no_batch_dims_saveable',
    'everything_saveable', ...); None means save nothing (full remat)."""
    if name is None:
        return None
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None or not callable(policy):
        raise ValueError(
            f"unknown remat policy {name!r}; pick an attribute of "
            "jax.checkpoint_policies (e.g. 'dots_saveable')")
    return policy


class TransformerEncoder(nn.Module):
    """1-D pre-LN encoder with optional CLS token, rotary or learned PE, and
    label-vector attention masking (modeling.py:283-376).

    Mask inputs (provide at most one family):
      * ``is_valid`` [.., L] and/or ``segment_ids`` [.., L] — fast path;
      * ``attention_mask`` [.., L, L] dense boolean — fallback.
    """

    hidden_size: int
    num_layers: int
    expansion_mult: int = 4
    size_per_head: int = 64
    dtype: Any = jnp.float32
    add_cls_token: bool = False
    cls_output_size: Optional[int] = None
    rotary_hsize: int = 32
    attention_impl: str = "auto"
    rotary_sign_quirk: bool = True
    remat: bool = False
    # selective remat: jax.checkpoint_policies name resolved at trace time
    # (None = save nothing). Only meaningful with remat=True.
    remat_policy: Optional[str] = None
    # lax.scan over layers: XLA compiles ONE layer body instead of num_layers
    # copies (an order of magnitude faster compiles for deep towers; same
    # steady-state). Param layout becomes stacked [num_layers, ...] under
    # 'layers'; utils/checkpoint.py stack/unstack converts to the reference's
    # per-layer 'layer_NN' naming.
    scan_layers: bool = False
    # sequence parallelism: shard the activations' sequence dim over this
    # mesh axis (requires an active mesh, parallel.mesh.activate_mesh); GSPMD
    # inserts the K/V collectives. Explicit ring attention lives in
    # ops/ring_attention.py for long-context use.
    seq_shard_axis: Optional[str] = None
    # partially unroll the layer scan: N layer bodies per loop iteration.
    # Middle ground between scan (1 compiled body, blocks XLA's cross-layer
    # backward fusion, ~27% slower training at base scale — BASELINE.md) and
    # full unroll (fastest, but num_layers x the HLO). Param layout stays
    # stacked — checkpoint compatible either way.
    scan_unroll: int = 1
    # pipeline parallelism: shard the stacked layer dim over this mesh axis
    # and stream microbatches through the stages (parallel/pipeline.py).
    # Requires scan_layers=True (stacked param layout) and an active mesh.
    pipeline_axis: Optional[str] = None
    pipeline_microbatches: int = 2

    @nn.compact
    def __call__(self, x, *, rotary_coords=None, attention_mask=None, is_valid=None,
                 segment_ids=None):
        *batch_dims, seq_len, hsz = x.shape
        assert hsz == self.hidden_size

        if self.add_cls_token:
            if attention_mask is not None:
                raise ValueError("attention_mask can't be combined with add_cls_token")
            seq_len += 1
            cls_token = self.param("cls", nn.initializers.normal(stddev=0.02),
                                   (self.hidden_size,))
            cls_tiled = jnp.broadcast_to(
                cls_token.astype(x.dtype), tuple(batch_dims) + (1, self.hidden_size))
            x = jnp.concatenate([cls_tiled, x], -2)
            if is_valid is not None:
                ones = jnp.ones(tuple(batch_dims) + (1,), dtype=is_valid.dtype)
                is_valid = jnp.concatenate([ones, is_valid], -1)
            if segment_ids is not None:
                # CLS participates globally only if everything shares a segment;
                # reference never combines CLS with packing, keep that contract.
                raise ValueError("segment_ids can't be combined with add_cls_token")
            if rotary_coords is not None:
                zero = jnp.zeros_like(rotary_coords[..., :1, :])
                rotary_coords = jnp.concatenate([zero, rotary_coords], -2)

        if rotary_coords is not None:
            assert rotary_coords.shape[-2] == seq_len
            assert self.rotary_hsize <= self.size_per_head
            sinusoids = rotary_ops.construct_rotary_sinusoids(
                rotary_coords, rotary_hsize=self.rotary_hsize)
        else:
            sinusoids = None
            pos_emb = self.param("pe", nn.initializers.normal(stddev=0.02),
                                 (seq_len, self.hidden_size))
            x += pos_emb.reshape((1,) * len(batch_dims) + pos_emb.shape)

        if attention_mask is not None and is_valid is not None:
            raise ValueError("provide only one of is_valid / attention_mask")
        attention_bias = None
        if attention_mask is not None:
            attention_bias = attn_ops.make_attention_bias(
                attention_mask=attention_mask, dtype=self.dtype)

        # Resolve the attention impl once: on the XLA path the additive mask
        # bias is hoisted HERE (computed once, broadcast into every layer /
        # scan iteration) instead of being rebuilt per layer; on the flash
        # path the raw labels stream into the kernel.
        has_labels = is_valid is not None or segment_ids is not None
        resolved_impl = attn_ops.resolve_impl(
            seq_len, self.attention_impl, has_bias=attention_bias is not None,
            has_labels=has_labels)
        if resolved_impl == "xla" and has_labels and attention_bias is None:
            attention_bias = attn_ops.make_attention_bias(
                is_valid=is_valid, segment_ids=segment_ids, dtype=self.dtype)
            is_valid = None
            segment_ids = None

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_ln")(x)

        if self.seq_shard_axis and not self.is_initializing():
            # sequence parallelism: one constraint is enough of a hint —
            # GSPMD propagates the seq sharding through the layers and
            # inserts the attention K/V collectives over the axis
            from jax.sharding import PartitionSpec as P
            spec = P(*([P.UNCONSTRAINED] * len(batch_dims)),
                     self.seq_shard_axis, P.UNCONSTRAINED)
            x = jax.lax.with_sharding_constraint(x, spec)

        layer_kwargs = dict(
            hidden_size=self.hidden_size, expansion_mult=self.expansion_mult,
            size_per_head=self.size_per_head, dtype=self.dtype,
            attention_impl=resolved_impl,
            rotary_sign_quirk=self.rotary_sign_quirk)

        if self.pipeline_axis and not self.is_initializing():
            # pipeline parallelism: apply the scan-stacked layer params via
            # the shard_map pipeline. Init still runs the nn.scan path below
            # (identical param creation); at apply time the stacked tree is
            # read off this module's bound scope.
            assert self.scan_layers, "pipeline_axis requires scan_layers=True"
            assert len(batch_dims) == 1, "pipeline expects [B, L, H] input"
            assert not resolved_impl.startswith(("ring", "ulysses")), (
                "attention_impl='ring'/'ulysses' can't run inside the "
                "pipeline's shard_map region (nested shard_map) — use GSPMD "
                "seq_shard_axis with pp, or ring/ulysses without pp")
            from merlot_reserve_tpu.parallel.mesh import current_mesh
            from merlot_reserve_tpu.parallel.pipeline import pipeline_transformer

            mesh = current_mesh()
            assert mesh is not None, (
                "pipeline_axis set but no active mesh — wrap the step in "
                "parallel.mesh.activate_mesh(mesh)")
            stacked = self.variables["params"]["layers"]
            layer_template = TransformerLayer(scan_format=True, **layer_kwargs)
            x = pipeline_transformer(
                stacked, x, sinusoids=sinusoids, is_valid=is_valid,
                segment_ids=segment_ids, attention_bias=attention_bias,
                layer=layer_template, mesh=mesh, axis=self.pipeline_axis,
                sp_axis=self.seq_shard_axis,
                num_microbatches=self.pipeline_microbatches,
                remat=self.remat,
                remat_policy=resolve_remat_policy(self.remat_policy))
        elif self.scan_layers:
            layer_cls = TransformerLayer
            if self.remat:
                layer_cls = nn.remat(layer_cls, prevent_cse=False,
                                     policy=resolve_remat_policy(
                                         self.remat_policy))
            scan_cls = nn.scan(
                layer_cls,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                length=self.num_layers,
                in_axes=nn.broadcast,
                out_axes=0,
                unroll=self.scan_unroll,
            )
            x, _ = scan_cls(scan_format=True, name="layers", **layer_kwargs)(
                x, sinusoids, is_valid, segment_ids, attention_bias)
        else:
            layer_cls = TransformerLayer
            if self.remat:
                layer_cls = nn.remat(TransformerLayer,
                                     policy=resolve_remat_policy(
                                         self.remat_policy))
            for layer_num in range(self.num_layers):
                x = layer_cls(name=f"layer_{layer_num:02d}", **layer_kwargs)(
                    x, sinusoids=sinusoids, is_valid=is_valid,
                    segment_ids=segment_ids, attention_bias=attention_bias)
        x_ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_ln")(x)

        info = {}
        if self.add_cls_token:
            cls_vec = x_ln[..., 0, :]
            out_size = self.hidden_size if self.cls_output_size is None else self.cls_output_size
            info["cls"] = nn.Dense(features=out_size, dtype=self.dtype,
                                   kernel_init=kernel_init, name="cls_proj")(cls_vec)
            info["seq"] = x_ln[..., 1:, :]
        else:
            info["seq"] = x_ln
        return info
