"""Input iterator: multi-file, multi-worker, prefetching pretraining loader.

The input_fn_builder equivalent (/root/reference/pretrain/dataloader.py:
864-960) without tf.data: per-host file sharding (i % num_hosts ==
host_index), epoch-shuffled file CYCLES of ``n_fns_per_cycle`` files whose
records interleave round-robin across up to ``num_parallel_reads``
concurrent readers and then pass through a ``shuffle_buffer_size``-record
shuffle buffer (the decorrelation the reference gets from
TFRecordDataset(num_parallel_reads) + dataset.shuffle, dataloader.py:
879-895,934-940 — consecutive batches must not come from one video
neighborhood or the contrastive negatives correlate), a thread pool
decoding/masking examples, fixed-size batches, and per-file/per-record
crash-only error handling (dataloader.py:943-955).

Throughput notes: work per example is JPEG decodes (PIL) + a few hundred
integers of masking; a pool of workers keeps a v5e chip fed at base-config
shapes. Deterministic seeding is supported (the reference deliberately seeds
with time() on restart, dataloader.py:922-924 — pass seed=None for that).
"""

from __future__ import annotations

import queue
import random as pyrandom
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Optional

import numpy as np

from merlot_reserve_tpu.config import MerlotConfig
from merlot_reserve_tpu.data.pretrain_pipeline import (
    PretrainExampleBuilder,
    collate_batch,
    parse_segment_record,
)
from merlot_reserve_tpu.data.tfrecord import read_records


class PretrainLoader:
    """Iterate fixed-shape pretraining batches from TFRecord shards."""

    def __init__(self, file_paths: List[str], cfg: MerlotConfig, batch_size: int,
                 host_index: int = 0, num_hosts: int = 1,
                 seed: Optional[int] = None, num_workers: int = 8,
                 prefetch: int = 4, use_bfloat16: bool = False,
                 repeat: bool = True, use_processes: bool = False,
                 files_per_cycle: Optional[int] = None,
                 parallel_reads: Optional[int] = None,
                 shuffle_buffer: Optional[int] = None):
        self.files = [f for i, f in enumerate(file_paths)
                      if i % num_hosts == host_index]
        if not self.files:
            raise ValueError("no input files for this host")
        self.cfg = cfg
        self.batch_size = batch_size
        self.use_bfloat16 = use_bfloat16
        self.repeat = repeat
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed if seed is not None else int(time.time())
        # decorrelation knobs; None picks up the config's device section
        # (the reference YAML surface: n_fns_per_cycle / num_parallel_reads
        # / shuffle_buffer_size)
        dev = cfg.device
        self.files_per_cycle = (files_per_cycle if files_per_cycle is not None
                                else dev.n_fns_per_cycle)
        self.parallel_reads = (parallel_reads if parallel_reads is not None
                               else dev.num_parallel_reads)
        self.shuffle_buffer = (shuffle_buffer if shuffle_buffer is not None
                               else dev.shuffle_buffer_size)
        # processes sidestep the GIL for the numpy masking work; threads are
        # enough when JPEG decode (GIL-released) dominates
        self.use_processes = use_processes
        self._builder = PretrainExampleBuilder(cfg)
        self._consumed = 0     # records consumed by yielded batches (incl. skips)
        self._skipped = 0      # corrupt records dropped (observability)
        self._iterating = False

    # -- resumable data state (beyond the reference: dataloader.py:922-924
    # deliberately re-seeds with time() on restart, losing the position) ----

    def state_dict(self) -> Dict:
        """Checkpointable position: restore with ``load_state_dict`` on a
        loader built with the SAME files/seed to continue the exact record
        sequence (per-example RNG is keyed by (seed, epoch, file, record),
        so the continuation is bit-identical)."""
        return {"seed": self.seed, "records_consumed": int(self._consumed),
                "records_skipped": int(self._skipped),
                "num_files": len(self.files),
                "shuffle": [self.files_per_cycle, self.parallel_reads,
                            self.shuffle_buffer]}

    def load_state_dict(self, state: Dict):
        if state.get("seed") != self.seed or \
                state.get("num_files") != len(self.files):
            raise ValueError("loader state does not match this loader's "
                             "seed/file shard — resume would silently "
                             "change the data stream")
        want = [self.files_per_cycle, self.parallel_reads,
                self.shuffle_buffer]
        if state.get("shuffle", want) != want:
            raise ValueError("loader state was written with different "
                             "cycle/interleave/shuffle settings — resume "
                             "would silently change the data stream")
        self._consumed = int(state["records_consumed"])

    def _record_stream(self, skip: int = 0):
        """(record_bytes, per-example rng) pairs: epoch-shuffled file cycles
        -> round-robin interleave -> shuffle buffer. ``skip`` fast-forwards
        that many POST-shuffle records (bytes are read and the shuffle RNG
        replays deterministically, but no decode/masking happens — resume
        cost is sequential IO only)."""
        for item in self._shuffled_records():
            if skip > 0:
                skip -= 1
                continue
            yield item

    def _interleave_cycle(self, cycle_files, epoch: int, base_fi: int):
        """Round-robin records from up to ``parallel_reads`` concurrently
        open readers over one cycle's files (TFRecordDataset
        num_parallel_reads semantics); per-file errors drop that reader and
        move on (crash-only, dataloader.py:943-955)."""
        pending = list(enumerate(cycle_files))

        def open_next():
            while pending:
                fi, path = pending.pop(0)
                try:
                    return [fi, path, iter(read_records(path)), 0]
                except Exception as e:
                    print(f"loader error opening {path}: "
                          f"{type(e).__name__}: {e}", flush=True)
                    time.sleep(1.0)
            return None

        k = max(1, min(self.parallel_reads, len(cycle_files)))
        readers = []
        for _ in range(k):
            r = open_next()
            if r:
                readers.append(r)
        i = 0
        while readers:
            r = readers[i % len(readers)]
            try:
                record = next(r[2])
            except StopIteration:
                readers.remove(r)
                nr = open_next()
                if nr:
                    readers.append(nr)
                continue
            except Exception as e:
                print(f"loader error on {r[1]}: {type(e).__name__}: {e}",
                      flush=True)
                time.sleep(1.0)
                readers.remove(r)
                nr = open_next()
                if nr:
                    readers.append(nr)
                continue
            ri = r[3]
            r[3] += 1
            yield record, np.random.default_rng(
                (self.seed, epoch, base_fi + r[0], ri))
            i += 1

    def _shuffled_records(self):
        """Cycles of ``files_per_cycle`` files, interleaved, through a
        ``shuffle_buffer``-element shuffle (fill buffer, emit a uniformly
        random element, refill — tf.data shuffle semantics with an explicit
        seeded RNG; buffer drains at each cycle boundary like the
        reference's per-cycle datasets).

        Memory: the buffer holds RAW record bytes — at base-corpus record
        sizes (~0.5-1 MB) the reference-parity 4096 buffer costs a few GB
        of host RAM, same as the reference's tf.data shuffle. Pass a
        smaller ``shuffle_buffer`` on small hosts."""
        rng_files = pyrandom.Random(self.seed)
        rng_shuf = pyrandom.Random(self.seed ^ 0x5DEECE66D)
        epoch = 0
        while True:
            files = list(self.files)
            rng_files.shuffle(files)
            fpc = max(1, min(self.files_per_cycle, len(files)))
            for c0 in range(0, len(files), fpc):
                buf = []
                for item in self._interleave_cycle(files[c0:c0 + fpc],
                                                   epoch, c0):
                    if self.shuffle_buffer <= 1:
                        yield item
                        continue
                    buf.append(item)
                    if len(buf) >= self.shuffle_buffer:
                        j = rng_shuf.randrange(len(buf))
                        buf[j], buf[-1] = buf[-1], buf[j]
                        yield buf.pop()
                while buf:
                    j = rng_shuf.randrange(len(buf))
                    buf[j], buf[-1] = buf[-1], buf[j]
                    yield buf.pop()
            epoch += 1
            if not self.repeat:
                return

    def _build_one(self, record_rng):
        record, rng = record_rng
        segments = parse_segment_record(record, self.cfg.data.num_segments)
        return self._builder.build(segments, rng)

    def _collate(self, examples):
        """Batch assembly hook (DevicePretrainLoader overrides this to run
        the on-device example builder instead)."""
        return collate_batch(examples, use_bfloat16=self.use_bfloat16)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Yield collated batches; decode+mask runs on a worker pool ahead of
        consumption (the prefetch_to_device role moves to the trainer, which
        enqueues the next batch while the step runs).

        Every iteration CONTINUES from the current position (``_consumed``
        records, as restored by load_state_dict or advanced by previous
        iteration) — re-iterating never replays records already yielded, so
        the resumable position stays a true stream offset. A repeat=False
        loader is therefore exhausted for good after one pass; build a new
        loader (new seed) for another epoch."""
        if self._iterating:
            raise RuntimeError("PretrainLoader does not support concurrent "
                               "iteration (the stream position is shared)")
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        producer_error: List[BaseException] = []

        def producer():
            # NOTE: Executor.map consumes its iterable EAGERLY — on an
            # infinite (repeat=True) stream it would submit forever. Keep a
            # bounded window of in-flight decode jobs instead.
            if self.use_processes:
                from concurrent.futures import ProcessPoolExecutor as Pool
            else:
                Pool = ThreadPoolExecutor
            def put_or_stop(item) -> bool:
                # never block forever: a consumer that stops early (e.g.
                # run_pretraining hit num_steps) must not leak this thread
                # parked in a full queue
                while not stop.is_set():
                    try:
                        out_q.put(item, timeout=0.5)
                        return True
                    except queue.Full:
                        continue
                return False

            try:
                with Pool(max_workers=self.num_workers) as pool:
                    from collections import deque

                    stream = self._record_stream(skip=self._consumed)
                    window = max(2 * self.num_workers, self.batch_size)
                    inflight = deque()
                    batch_examples = []
                    skipped_in_batch = 0
                    while not stop.is_set():
                        while len(inflight) < window:
                            try:
                                inflight.append(
                                    pool.submit(self._build_one, next(stream)))
                            except StopIteration:
                                break
                        if not inflight:
                            break
                        # Per-record resilience: one poisoned record must not
                        # end the stream (the reference swallows ANY pipeline
                        # error and resumes, dataloader.py:943-955 — we skip
                        # and COUNT instead of swallowing silently).
                        try:
                            ex = inflight.popleft().result()
                        except Exception as e:
                            self._skipped += 1
                            skipped_in_batch += 1
                            print(f"loader: skipping corrupt record "
                                  f"({type(e).__name__}: {e}); "
                                  f"{self._skipped} skipped total", flush=True)
                            continue
                        batch_examples.append(ex)
                        if len(batch_examples) == self.batch_size:
                            batch = self._collate(batch_examples)
                            # the batch "consumed" its skips too, so the
                            # resume position stays a raw-record count
                            if not put_or_stop(
                                    (batch,
                                     self.batch_size + skipped_in_batch)):
                                break
                            batch_examples = []
                            skipped_in_batch = 0
            except Exception as e:
                # a producer-level failure (collate/device error, not a
                # per-record skip) must surface to the trainer — ending the
                # stream here would read as "input exhausted" and a long
                # pretraining job would exit hours early WITH SUCCESS status
                print(f"loader producer died: {type(e).__name__}: {e}", flush=True)
                producer_error.append(e)
            finally:
                put_or_stop(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        self._iterating = True
        try:
            while True:
                item = out_q.get()
                if item is None:
                    if producer_error:
                        raise RuntimeError(
                            "loader producer failed") from producer_error[0]
                    return
                batch, n_records = item
                self._consumed += n_records
                yield batch
        finally:
            self._iterating = False
            stop.set()


class DevicePretrainLoader(PretrainLoader):
    """PretrainLoader with example assembly moved onto the accelerator.

    Worker threads only decode bytes (JPEG frames/spectrograms, protobuf
    fields -> fixed-shape arrays via DeviceExampleBuilder.host_prepare); the
    masking/placement/collation runs as ONE jit per batch on device
    (data/device_builder.py). Masks are drawn from a jax PRNG keyed by
    (seed, batch_counter) — deterministic given the seed, and fresh every
    epoch with zero host CPU cost. On resume the counter restarts, so the
    mask DRAWS differ from the uninterrupted run while the record sequence
    stays exact (the reference re-seeds everything on restart,
    dataloader.py:922-924)."""

    def __init__(self, *args, fused: bool = False,
                 on_device_frames: Optional[bool] = None, **kw):
        super().__init__(*args, **kw)
        from merlot_reserve_tpu.data.device_builder import DeviceExampleBuilder

        self._dev_builder = DeviceExampleBuilder(self.cfg)
        self._batch_counter = 0
        # fused=True: yield the RAW stacked host arrays (host_prepare output
        # + decoded images) and issue NO device calls from the loader — the
        # example assembly runs inside the fused train step
        # (training/trainer.py::make_jit_fused_data_train_step), one
        # dispatch per step, mask PRNG folded from state.step in-graph
        self.fused = fused
        # on_device_frames: frame flip/resize/augment/patchify move in-graph
        # too (ops/vision_train.py) — host workers only DECODE frame bytes
        self.on_device_frames = (self.cfg.data.on_device_frames
                                 if on_device_frames is None
                                 else on_device_frames)

    def _build_one(self, record_rng):
        record, rng = record_rng
        segments = parse_segment_record(record, self.cfg.data.num_segments)
        raw = self._dev_builder.host_prepare(segments)
        if self.on_device_frames:
            raw.update(self._dev_builder.host_prepare_frames(segments))
            return raw, None
        images = np.stack([self._builder.decode_image(s, rng)
                           for s in segments])
        return raw, images

    def _collate(self, examples):
        import jax
        import jax.numpy as jnp

        from merlot_reserve_tpu.data.device_builder import stack_raw_examples

        raws = [r for r, _ in examples]
        if self.on_device_frames:
            imgs = None
        else:
            images = np.stack([im for _, im in examples])
            B = images.shape[0]
            imgs = images.reshape(B, -1, images.shape[-1]).astype(np.float32)
        if self.fused:
            raw_batch = stack_raw_examples(raws)
            assert "images" not in raw_batch
            if imgs is not None:
                if self.use_bfloat16:
                    # cast host-side: images dominate the host->device bytes
                    # (the in-graph cast would re-do this as a no-op)
                    imgs = imgs.astype(jnp.bfloat16)
                raw_batch["images"] = imgs
            return raw_batch
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed),
                                 self._batch_counter)
        self._batch_counter += 1
        raw_batch = jax.tree.map(jnp.asarray, stack_raw_examples(raws))
        batch = dict(self._dev_builder.build_batch(key, raw_batch))
        if imgs is not None:
            if self.use_bfloat16:
                imgs = imgs.astype(jnp.bfloat16)
            batch["images"] = imgs
        return batch


def input_fn_builder(cfg: MerlotConfig, file_paths: List[str],
                     host_index: int = 0, num_hosts: int = 1,
                     seed: Optional[int] = None, on_device: bool = False,
                     **kw) -> PretrainLoader:
    """Reference-shaped constructor (dataloader.py:906-960): global batch is
    divided by num_hosts; each host reads its file shard. ``on_device=True``
    assembles examples on the accelerator (DevicePretrainLoader)."""
    assert cfg.device.batch_size % num_hosts == 0, (
        f"global batch {cfg.device.batch_size} must divide across "
        f"{num_hosts} hosts (the reference divides exactly, "
        f"dataloader.py:920)")
    per_host_batch = cfg.device.batch_size // num_hosts
    cls = DevicePretrainLoader if on_device else PretrainLoader
    return cls(file_paths, cfg, per_host_batch,
               host_index=host_index, num_hosts=num_hosts,
               seed=seed, **kw)
