"""The full pretraining example builder as ONE device program.

SURVEY §2.5's TPU-native endgame: the reference assembles each training
example on the host with tf.data ragged ops
(/root/reference/pretrain/dataloader.py:449-712). Round 2 moved the masking
engine on-device (ops/masking_device.py); this module fuses the REST of the
example assembly around it — spectrogram dequant + random subsegment
placement, token->audio assignment, span donation/widening, MASK/AUDIOSPAN
rewriting, budget selection, the audio_text_matching and random_text
sequence builders, the text-span table, and collation — into one jit,
vmapped over the batch.

Division of labor:
  * host (``host_prepare``): byte decoding only — JPEG->u8 spectrogram,
    protobuf ints/floats padded to fixed shapes, tokenizer-dependent aux
    prefix. No randomness, no masking, no float math.
  * device (``build`` / ``build_batch``): everything else, driven by a jax
    PRNG key. Fresh masks every epoch cost zero host CPU — the 26k ex/s/chip
    masking-engine throughput extends to the whole example plane.

Parity contract: deterministic stages equal data/pretrain_pipeline.py's host
builder on identical inputs (tests/test_device_builder.py); stochastic
stages share the distribution but not the draw (the host engine uses numpy
RNG, this one jax PRNG).

Shape notes: everything is fixed-shape. Per-segment token counts cap at
``max_tokens_per_segment`` (host_prepare truncates and reports); raw text
caps at ``raw_text_len``. The reference's ragged streams become
(values, row_lengths) pairs exactly as in ops/masking_device.py.

Accepted cap deviation (tests/test_device_builder_longtail.py): on an
adversarial heavy-tail corpus (segments to 120 tokens, ~16% truncated)
the caps shift the text-span length distribution by KL 0.013 nats / 0.43
mean tokens vs an uncapped build under the same PRNG key — budgeted at
<0.02 / <0.5. Spans themselves cap at text_span_length in EVERY builder
(host, device, reference), so truncation only thins mask candidates; the
``stats`` counters report exactly what was dropped.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from merlot_reserve_tpu.config import MerlotConfig
from merlot_reserve_tpu.ops import masking_device as dev
from merlot_reserve_tpu.tokenizer import (
    AUDIOSPAN,
    END,
    LTOVPOOL,
    PADDING,
    START,
    get_tokenizer,
    token_is_valid_table,
)

_PAD_TRIPLE = np.asarray([0, -1, -1], np.int32)


def _compact(triples, valid, out_len: int):
    """Stable-compact valid [L, 3] rows to the front, pad/truncate to
    out_len (the device analogue of pad_tokens_to_fixed_size after a
    validity-ordered concat)."""
    order = jnp.argsort(~valid, stable=True)
    t = triples[order][:out_len]
    v = valid[order][:out_len]
    return jnp.where(v[:, None], t, jnp.asarray(_PAD_TRIPLE)[None]), v


class DeviceExampleBuilder:
    """Builds pretraining batches on the accelerator.

    Usage::

        builder = DeviceExampleBuilder(cfg)
        raw = builder.host_prepare(segments)          # host, bytes -> arrays
        batch = builder.build_batch(key, raw_batch)   # ONE jit on device
    """

    def __init__(self, cfg: MerlotConfig, max_tokens_per_segment: int = 48,
                 aux_len: int = 160, raw_text_len: int = 1024):
        self.cfg = cfg
        d = cfg.data
        self.S = d.num_segments
        self.A = d.num_audio_subsegments
        self.N = d.num_audio_spans
        self.TM = max_tokens_per_segment
        self.AUXL = aux_len
        self.RTL = raw_text_len
        self.n_trg = int(self.N * d.mask_rate)
        self.span_len = cfg.model.text_span_length
        # static flat-stream bound for fake text segmentation — shared with
        # convert_rawtext_into_fake_segments' row bound (single source)
        from merlot_reserve_tpu.ops.masking_device import rawtext_flat_bound

        self.rt_flat_bound = rawtext_flat_bound(d.seq_len, d.text_span_budget)
        # a subsegment row can hold a whole segment's tokens plus donation
        # (<=2) and widening (<=2) boundary moves
        self.max_row = max(self.TM + 4, cfg.model.audio_token_length,
                           self.span_len)
        # host_prepare's truncate-and-report contract: segments with more
        # than max_tokens_per_segment ASR tokens are clipped and counted
        # here. Lock: host_prepare runs on loader worker THREADS; unlocked
        # += would interleave. (Under a process pool the counts stay in the
        # child — thread pools are the loader default and the only mode
        # where these counters are meaningful.)
        import threading

        self.stats = {"truncated_segments": 0, "truncated_tokens": 0,
                      "oversize_frames": 0}
        self._stats_lock = threading.Lock()
        self._mask_tbl = jnp.asarray(token_is_valid_table())

        enc = get_tokenizer()
        self._title_prefix = enc.encode("title:").ids
        self._desc_prefix = enc.encode("description:").ids
        self._tags_prefix = enc.encode("tags:").ids

    # ------------------------------------------------------------------
    # host side: bytes -> fixed-shape arrays (no randomness, no masking)
    # ------------------------------------------------------------------

    def host_prepare(self, segments: List[Dict]) -> Dict[str, np.ndarray]:
        """Decode one record's segments to the builder's device inputs
        (counterpart of the decode portion of PretrainExampleBuilder.build,
        data/pretrain_pipeline.py; JPEG decode must stay host-side)."""
        from merlot_reserve_tpu.data.pretrain_pipeline import (_decode_jpeg,
                                                               _scalar)
        from merlot_reserve_tpu.data import native as N_

        d = self.cfg.data
        S, TM = self.S, self.TM
        assert len(segments) == S

        spec_u8 = np.zeros((S, d.spec_size, d.num_mels), np.uint8)
        magic = np.ones(S, np.float32)
        playback = np.ones(S, np.float32)
        tok_ids = np.zeros((S, TM), np.int32)
        tok_num = np.zeros(S, np.int32)
        tok_start = np.zeros((S, TM), np.float32)
        tok_end = np.zeros((S, TM), np.float32)
        seg_start = np.zeros(S, np.float32)
        seg_end = np.full(S, 5.0, np.float32)
        video_src = np.ones(S, np.int32)

        for i, seg in enumerate(segments):
            data = bytes(seg["spectrogram/encoded"][0])
            if N_.native_available():
                spec = N_.decode_jpeg_native(data, channels=1)
            else:
                spec = _decode_jpeg(data, channels=1)
            spec_u8[i] = spec.reshape(d.num_mels, d.spec_size).T
            magic[i] = float(_scalar(seg["spectrogram/magic_number"], 1.0))
            # int() to match the host builder exactly (pretrain_pipeline.py
            # floors fractional speeds before building the speed channel)
            playback[i] = int(_scalar(seg.get("playback_speed", [1]), 1))
            ids_full = np.asarray(seg.get("tok_ids", np.zeros(0, np.int64)))
            if len(ids_full) > TM:  # report: contract is truncate-and-count
                with self._stats_lock:
                    self.stats["truncated_segments"] += 1
                    self.stats["truncated_tokens"] += len(ids_full) - TM
            ids = ids_full[:TM]
            tok_ids[i, :len(ids)] = ids
            tok_num[i] = len(ids)
            ts = np.asarray(seg.get("tok_start_times", np.zeros(0)))[:TM]
            te = np.asarray(seg.get("tok_end_times", np.zeros(0)))[:TM]
            tok_start[i, :len(ts)] = ts
            tok_end[i, :len(te)] = te
            seg_start[i] = float(_scalar(seg.get("start_time", 0.0), 0.0))
            seg_end[i] = float(_scalar(seg.get("end_time", 5.0), 5.0))
            video_src[i] = int(_scalar(seg.get("video_src_index", 1), 1))

        aux_full = np.concatenate([
            [START], self._title_prefix,
            np.asarray(segments[0].get("title", []), np.int64),
            [START], self._desc_prefix,
            np.asarray(segments[0].get("description", []), np.int64),
            [START], self._tags_prefix,
            np.asarray(segments[0].get("tags", []), np.int64),
            [END]]).astype(np.int32)[:self.AUXL]
        aux = np.zeros(self.AUXL, np.int32)
        aux[:len(aux_full)] = aux_full

        n_rt = d.num_text_seqs_in_record
        random_text = np.zeros((n_rt, self.RTL), np.int32)
        random_text_num = np.zeros(n_rt, np.int32)
        for i in range(n_rt):
            rt = np.asarray(segments[i].get("random_text",
                                            np.zeros(0, np.int64)))[:self.RTL]
            random_text[i, :len(rt)] = rt
            random_text_num[i] = len(rt)

        return {
            "spec_u8": spec_u8, "magic": magic, "playback": playback,
            "tok_ids": tok_ids, "tok_num": tok_num,
            "tok_start": tok_start, "tok_end": tok_end,
            "seg_start": seg_start, "seg_end": seg_end,
            "aux": aux, "aux_num": np.int32(len(aux_full)),
            "random_text": random_text, "random_text_num": random_text_num,
            "video_src_index": video_src,
        }

    def host_prepare_frames(self, segments: List[Dict]) -> Dict[str, np.ndarray]:
        """Decode one record's frames into fixed square uint8 buffers for
        the on-device preprocessing path (ops/vision_train.py): JPEG decode
        is the ONLY host work — flip/resize/augment/patchify run in-graph.
        Frames too large for the buffer (anomalies; the reference corpus
        caps storage frames at 512px, data/process.py) are host-downscaled
        to fit and counted in ``stats['oversize_frames']``."""
        from merlot_reserve_tpu.data.pretrain_pipeline import _decode_jpeg
        from merlot_reserve_tpu.data import native as N_

        FB = self.cfg.data.frame_buffer_size
        S = self.S
        frames = np.zeros((S, FB, FB, 3), np.uint8)
        hw = np.zeros((S, 2), np.int32)
        for i, seg in enumerate(segments):
            data = bytes(seg["image/encoded"][0])
            if N_.native_available():
                img = N_.decode_jpeg_native(data, channels=3)
            else:
                img = _decode_jpeg(data, channels=3)
            h, w = img.shape[:2]
            if max(h, w) > FB - 8:  # -8: room for the flip side markers
                with self._stats_lock:
                    self.stats["oversize_frames"] += 1
                from PIL import Image

                s = (FB - 8) / max(h, w)
                img = np.asarray(Image.fromarray(img).resize(
                    (max(int(w * s), 1), max(int(h * s), 1)),
                    Image.Resampling.BILINEAR))
                h, w = img.shape[:2]
            frames[i, :h, :w] = img
            hw[i] = (h, w)
        return {"frames_u8": frames, "frame_hw": hw}

    # ------------------------------------------------------------------
    # device side
    # ------------------------------------------------------------------

    def _frames(self, key, raw):
        """Training-frame preprocessing in-graph: flip-if-vertical +
        random-scale resize + per-frame random Pillow kernel + random crop +
        patchify (ops/vision_train.py; reference host equivalent:
        dataloader.py:63-85 + data_utils.py:42-147)."""
        from merlot_reserve_tpu.ops import vision_train as VT

        d = self.cfg.data
        return VT.augment_frames(
            key, raw["frames_u8"], raw["frame_hw"],
            tuple(self.cfg.model.output_grid),
            (d.random_scale_min, d.random_scale_max),
            d.random_resize_method)

    def _audio_clips(self, key, raw):
        """Random subsegment placement + window slice + dequant + speed
        channel + real window times (dataloader.py:88-128 /
        pretrain_pipeline.decode_audio)."""
        d = self.cfg.data
        m = self.cfg.model
        keys = jax.random.split(key, self.S)
        starts = jax.vmap(lambda k: dev.place_audio_subsegments(
            k, d.spec_size, self.A, m.audio_seq_length))(keys)  # [S, A]

        window = starts[:, :, None] + jnp.arange(m.audio_seq_length)  # [S,A,W]
        spec = raw["spec_u8"].astype(jnp.float32)  # [S, T, mels]
        clips = spec[jnp.arange(self.S)[:, None, None], window]  # [S,A,W,mels]
        clips = clips / raw["magic"][:, None, None, None]
        speed = jnp.broadcast_to(raw["playback"][:, None, None, None],
                                 clips.shape[:-1] + (1,))
        clips = jnp.concatenate([clips, speed], -1)

        from merlot_reserve_tpu.data.masking import audio_window_times

        # single-sourced with the host builder (f32 on device)
        start_t, end_t = audio_window_times(
            starts, m.audio_seq_length, d.sample_rate, d.fft_hop_length,
            d.fft_window_size, dtype=jnp.float32)
        return clips, start_t, end_t

    def _token_ragged(self, raw, start_t, end_t):
        """Assignment of every token to its audio subsegment row and the
        flat (values, row_lengths) ragged stream in global time order
        (dataloader.py:505-531)."""
        S, TM, N = self.S, self.TM, self.N
        tok_valid = jnp.arange(TM)[None] < raw["tok_num"][:, None]  # [S, TM]
        cent = (raw["tok_start"] + raw["tok_end"]) / 2.0

        audio_cent = (start_t + end_t) / 2.0  # [S, A]
        assignment = jax.vmap(dev.assign_tokens_to_audio)(cent, audio_cent)
        rowids = assignment + jnp.arange(S)[:, None] * self.A  # [S, TM]

        # global running time offset per segment
        seg_dur = raw["seg_end"] - raw["seg_start"]
        t_off = jnp.concatenate([jnp.zeros(1), jnp.cumsum(seg_dur)[:-1]])
        cent_g = cent + t_off[:, None]
        audio_start_end = jnp.stack(
            [start_t + t_off[:, None], end_t + t_off[:, None]], -1
        ).reshape(N, 2)

        # compact valid tokens to the front; segment-major order == the host
        # ragged's stable row sort since rowids are globally nondecreasing
        flat_valid = tok_valid.reshape(-1)
        order = jnp.argsort(~flat_valid, stable=True)
        tokens_flat = raw["tok_ids"].reshape(-1)[order]
        cent_flat = cent_g.reshape(-1)[order]

        rid_scatter = jnp.where(tok_valid, rowids, N).reshape(-1)
        row_lengths = jnp.zeros(N, jnp.int32).at[rid_scatter].add(
            1, mode="drop")
        return tokens_flat, row_lengths, cent_flat, audio_start_end

    def _text2audio(self, key, tokens, row_lengths, cent, ase, trg_idx):
        """One text2audio sequence: donate -> widen -> MASK+MASKAUDIO ->
        budget select (dataloader.py:543-566)."""
        d = self.cfg.data
        k1, k2, k3 = jax.random.split(key, 3)
        masked = jnp.zeros(self.N, bool).at[trg_idx].set(True)
        rl = dev.reassign_empty_tokens(row_lengths, masked, k1)
        rl = dev.increase_textmask(rl, masked, cent, ase, k2,
                                   delta_thresh=0.125)
        return rl, masked, k3

    def _random_text_seq(self, key, raw_tokens, n_raw, counter: int):
        """One random_text sequence: fake segmentation -> maskable-preferred
        span draw -> mask -> left/right context fill (dataloader.py:640-692)."""
        d = self.cfg.data
        seq_len = d.seq_len
        budget = d.text_span_budget
        k_seg, k_mask, k_tok = jax.random.split(key, 3)

        lens, offset, l_sel = dev.convert_rawtext_into_fake_segments(
            k_seg, raw_tokens, n_raw, desired_len=seq_len, span_budget=budget)
        n_rows = lens.shape[0]
        LB = self.rt_flat_bound
        vals = jnp.take(raw_tokens,
                        jnp.clip(offset + jnp.arange(LB), 0, self.RTL - 1))

        # prefer fully-maskable rows 4:1 (dataloader.py:676-679)
        rid = dev.value_rowids(lens, LB)
        tok_ok = self._mask_tbl[jnp.clip(vals, 0, self._mask_tbl.shape[0] - 1)]
        in_stream = jnp.arange(LB) < l_sel
        row_ok = jax.ops.segment_min(
            jnp.where(in_stream, tok_ok.astype(jnp.int32), 1), rid,
            num_segments=n_rows)
        want = (row_ok > 0) & (lens > 0)
        logits = jnp.where(lens > 0,
                           jnp.log(0.2 + 0.8 * want.astype(jnp.float32)),
                           -jnp.inf)
        g = -jnp.log(-jnp.log(jax.random.uniform(
            k_mask, (n_rows,), minval=1e-20, maxval=1.0)))
        top = jax.lax.top_k(logits + g, budget)[1]
        masked = jnp.zeros(n_rows, bool).at[top].set(True)
        masked &= lens > 0  # fewer real rows than the budget: mask what exists

        # fake-segment rows draw lengths 1..len(_WEIGHTS_V2)=15 regardless of
        # the configured span length: max_row must cover 15 (or the scatter
        # drops row tails), and the span-table width must match the t2a/a2t
        # tables for the build() concat at any text_span_length
        spans, streams = dev.mask_tokens(
            k_tok, vals, lens, masked, max_row=max(self.span_len, 15),
            text_span_start_counter=counter, num_groups=1,
            text_span_len=self.span_len)
        stream_t, stream_v = streams[0]

        # left/right raw-context fill into the remaining budget
        total = stream_v.sum()
        needed = jnp.maximum(seq_len - total, 0)
        lhs_amt = jnp.minimum(offset, needed // 2)
        rhs_avail = jnp.maximum(n_raw - (offset + l_sel), 0)
        rhs_amt = jnp.minimum(rhs_avail, (needed + 1) // 2)

        pos = jnp.arange(seq_len)
        lhs_tok = jnp.take(raw_tokens,
                           jnp.clip(offset - lhs_amt + pos, 0, self.RTL - 1))
        lhs = jnp.stack([lhs_tok, jnp.zeros(seq_len, jnp.int32),
                         jnp.full(seq_len, -1, jnp.int32)], -1)
        lhs_v = pos < lhs_amt

        # max over (rowid where nonzero else -1) is already -1 when empty
        last_ptr = jnp.max(jnp.where(lens > 0, jnp.arange(n_rows), -1))
        rhs_tok = jnp.take(raw_tokens,
                           jnp.clip(offset + l_sel + pos, 0, self.RTL - 1))
        rhs = jnp.stack([rhs_tok,
                         jnp.broadcast_to(last_ptr + 1, (seq_len,)),
                         jnp.full(seq_len, -1, jnp.int32)], -1)
        rhs_v = pos < rhs_amt

        triples = jnp.concatenate([lhs, stream_t, rhs], 0)
        valid = jnp.concatenate([lhs_v, stream_v, rhs_v], 0)
        out, _ = _compact(triples, valid, seq_len)

        # span table rows: masked rows' contents, non-maskable tokens
        # dropped (dataloader.py:389-397), compacted left, -1 padded
        sel = jnp.sort(jnp.where(masked, jnp.arange(n_rows), n_rows))[:budget]
        spans_sel = spans[jnp.clip(sel, 0, n_rows - 1)]
        spans_sel = jnp.where((sel < n_rows)[:, None], spans_sel, -1)
        keep = (spans_sel >= 0) & self._mask_tbl[
            jnp.clip(spans_sel, 0, self._mask_tbl.shape[0] - 1)]
        korder = jnp.argsort(~keep, axis=-1, stable=True)
        spans_out = jnp.where(
            jnp.take_along_axis(keep, korder, -1),
            jnp.take_along_axis(spans_sel, korder, -1), -1)
        return out, spans_out

    def _audio_text_matching(self, key, raw):
        """The matching stream: per segment one LTOVPOOL token plus either
        18 AUDIOSPAN tokens or the segment's ASR text (one coin for the
        whole example), prefixed by title/description/tags up to budget
        (dataloader.py:598-636)."""
        d = self.cfg.data
        m = self.cfg.model
        S, TM, A = self.S, self.TM, self.A
        use_audio = jax.random.uniform(key) < d.use_audio_token_prob

        n_audio_tok = A * m.audio_token_length
        BL = 1 + max(n_audio_tok, TM)
        seg_ids = jnp.arange(S)[:, None]

        # audio variant block
        a_tok = jnp.full((S, BL), 0, jnp.int32)
        a_tok = a_tok.at[:, 0].set(LTOVPOOL)
        a_tok = a_tok.at[:, 1:1 + n_audio_tok].set(AUDIOSPAN)
        a_ptr = jnp.concatenate([
            seg_ids * A,
            seg_ids * A + jnp.arange(n_audio_tok)[None] // m.audio_token_length,
            jnp.zeros((S, BL - 1 - n_audio_tok), jnp.int32)], 1)
        a_val = jnp.arange(BL)[None] < (1 + n_audio_tok)
        a_val = jnp.broadcast_to(a_val, (S, BL))

        # text variant block (the segment's tokens in time order)
        t_tok = jnp.full((S, BL), 0, jnp.int32)
        t_tok = t_tok.at[:, 0].set(LTOVPOOL)
        t_tok = t_tok.at[:, 1:1 + TM].set(raw["tok_ids"])
        t_ptr = jnp.broadcast_to(seg_ids * A, (S, BL))
        t_val = jnp.concatenate([
            jnp.ones((S, 1), bool),
            jnp.arange(TM)[None] < raw["tok_num"][:, None],
            jnp.zeros((S, BL - 1 - TM), bool)], 1)

        tok = jnp.where(use_audio, a_tok, t_tok)
        ptr = jnp.where(use_audio, a_ptr, t_ptr)
        val = jnp.where(use_audio, a_val, t_val)

        triples = jnp.stack(
            [tok, ptr, jnp.full((S, BL), -1, jnp.int32)], -1).reshape(-1, 3)
        valid = val.reshape(-1)

        total = valid.sum()
        extra_space = jnp.maximum(d.seq_len - total, 0)
        aux_keep = jnp.arange(self.AUXL) < jnp.minimum(extra_space,
                                                       raw["aux_num"])
        aux_triples = jnp.stack(
            [raw["aux"], jnp.full(self.AUXL, -1, jnp.int32),
             jnp.full(self.AUXL, -1, jnp.int32)], -1)

        out, _ = _compact(jnp.concatenate([aux_triples, triples], 0),
                          jnp.concatenate([aux_keep, valid], 0), d.seq_len)
        return out

    def build(self, key, raw: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """One example, fully on device. Output dict matches
        PretrainExampleBuilder.build minus 'images' (frames keep their own
        host/native decode path)."""
        d = self.cfg.data
        keys = jax.random.split(key, 8)

        clips, start_t, end_t = self._audio_clips(keys[0], raw)
        tokens, row_lengths, cent, ase = self._token_ragged(raw, start_t, end_t)

        n_t2a, n_a2t = d.num_text2audio_seqs, d.num_audio2text_seqs
        n_trg = self.n_trg
        trg = jax.random.permutation(keys[1], self.N)[:n_trg * (n_t2a + n_a2t)]
        t2a_idx = trg[:n_trg * n_t2a].reshape(n_t2a, n_trg)
        a2t_idx = trg[n_trg * n_t2a:].reshape(n_a2t, n_trg)

        span_tables = []

        # ---- text2audio ----
        t2a_streams = []
        for i in range(n_t2a):
            rl, masked, k_mask = self._text2audio(
                jax.random.fold_in(keys[2], i), tokens, row_lengths, cent,
                ase, t2a_idx[i])
            spans, streams = dev.mask_tokens(
                k_mask, tokens, rl, masked, max_row=self.max_row,
                do_audio_mask=True, padded_seq_len=d.lang_seq_len,
                num_groups=d.num_segment_groups,
                text_span_start_counter=i * n_trg,
                text_span_len=self.span_len)
            for t, v in streams:
                t2a_streams.append(jnp.where(v[:, None], t,
                                             jnp.asarray(_PAD_TRIPLE)[None]))
            span_tables.append(spans[jnp.sort(t2a_idx[i])])
        text2audio = jnp.stack(t2a_streams, 0)

        # ---- audio2text ----
        a2t_streams = []
        for i in range(n_a2t):
            masked = jnp.zeros(self.N, bool).at[a2t_idx[i]].set(True)
            neighbor = jnp.concatenate([masked[1:], jnp.zeros(1, bool)]) | \
                jnp.concatenate([jnp.zeros(1, bool), masked[:-1]])
            should_textify = neighbor & ~masked
            coin = jax.random.uniform(jax.random.fold_in(keys[3], i),
                                      (self.N,)) < 0.8
            should_textify &= coin
            spans, streams = dev.mask_tokens(
                jax.random.fold_in(keys[4], i), tokens, row_lengths, masked,
                max_row=self.max_row, do_audio_span=~should_textify,
                audio_token_length=self.cfg.model.audio_token_length,
                padded_seq_len=d.lang_seq_len,
                num_groups=d.num_segment_groups,
                text_span_start_counter=(i + n_t2a) * n_trg,
                text_span_len=self.span_len)
            for t, v in streams:
                a2t_streams.append(jnp.where(v[:, None], t,
                                             jnp.asarray(_PAD_TRIPLE)[None]))
            span_tables.append(spans[jnp.sort(a2t_idx[i])])
        audio2text = jnp.stack(a2t_streams, 0)

        # ---- audio_text_matching ----
        matching = self._audio_text_matching(keys[5], raw)[None]

        # ---- random_text ----
        counter = n_trg * (n_t2a + n_a2t)
        pick = jax.random.permutation(keys[6], d.num_text_seqs_in_record
                                      )[:d.num_text_seqs]
        rt_streams = []
        for i in range(d.num_text_seqs):
            rt_tokens = jnp.take(raw["random_text"], pick[i], axis=0)
            rt_num = jnp.take(raw["random_text_num"], pick[i])
            out, spans = self._random_text_seq(
                jax.random.fold_in(keys[7], i), rt_tokens, rt_num, counter)
            rt_streams.append(out)
            span_tables.append(spans)
            counter += d.text_span_budget
        random_text = jnp.stack(rt_streams, 0)

        # ---- span table: -1 pad -> PADDING, fixed total rows ----
        table = jnp.concatenate(span_tables, 0)[:, :self.span_len]
        table = jnp.where(table >= 0, table, PADDING).astype(jnp.int32)

        out = {
            "audio_clips": clips,
            "text2audio": text2audio,
            "audio2text": audio2text,
            "audio_text_matching": matching,
            "random_text": random_text,
            "text_spans": table,
            "video_src_index": raw["video_src_index"],
        }
        if "frames_u8" in raw:
            # fold_in (not a wider key split) keeps every other stage's
            # draws identical whether or not frames ride along
            out["images"] = self._frames(jax.random.fold_in(key, 0x46524D),
                                         raw)
        return out

    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def build_batch(self, key, raw_batch: Dict[str, jnp.ndarray]
                    ) -> Dict[str, jnp.ndarray]:
        """vmapped build + device collate: one jit from raw arrays to the
        trainer's batch dict (collate_batch semantics,
        data/pretrain_pipeline.py::collate_batch, minus 'images')."""
        B = jax.tree_util.tree_leaves(raw_batch)[0].shape[0]
        keys = jax.random.split(key, B)
        ex = jax.vmap(self.build)(keys, raw_batch)

        d = self.cfg.data
        batch = {}
        clips = ex["audio_clips"]  # [B, S, A, W, mels+1]
        batch["audio_clips"] = clips.reshape(B, -1, clips.shape[-1])
        for k in ("text2audio", "audio2text", "audio_text_matching",
                  "random_text"):
            x = ex[k]  # [B, n, L, 3]
            batch[k] = x[..., 0]
            batch[f"{k}/audio_ptr"] = x[..., 1]
            batch[f"{k}/text_ptr"] = x[..., 2]
        batch["text_spans"] = ex["text_spans"]
        batch["video_src_index"] = ex["video_src_index"]
        if "images" in ex:  # on-device frame path: [B, S, hw, 768]
            imgs = ex["images"]
            batch["images"] = imgs.reshape(B, -1, imgs.shape[-1])
        if self.cfg.model.use_bfloat16:
            batch["audio_clips"] = batch["audio_clips"].astype(jnp.bfloat16)
            if "images" in batch:
                batch["images"] = batch["images"].astype(jnp.bfloat16)
        return batch


def stack_raw_examples(raws: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Host-side collation of host_prepare outputs to the batched raw dict
    build_batch consumes."""
    return {k: np.stack([r[k] for r in raws]) for k in raws[0]}
