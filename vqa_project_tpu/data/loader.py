"""Fixed-shape batching with background host prefetch.

Replaces the reference's torch DataLoader + collate_fn
(/root/reference/torch_dataset.py:27-31, run.py:132). The descending-qlen
sort that fed pack_padded_sequence is unnecessary — the masked GRU scan
takes any order — so batches are plain vectorized gathers from the packed
tables. Every batch has identical shapes (jit caches one executable);
the final partial batch is padded and carries a validity mask.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np

from vqa_project_tpu.data.datasets import GraphVQADataset


class Batcher:
    """Iterable over fixed-shape numpy batches.

    Yields dicts with:
      question (B, T) int32 | answers (B, C) f32 | votes (B, C) f32 |
      image (B, K, F) f32 | qlen (B,) int32 | qid (B,) int64 |
      mask (B,) f32 (0 for padding rows of the final batch) |
      index (B,) int64 (row into dataset.vqa, for result emission)
    """

    def __init__(self, dataset: GraphVQADataset, batch_size: int,
                 shuffle: bool = False, seed: int = 1000,
                 drop_last: bool = False, materialize: bool = True,
                 partitions: Optional[np.ndarray] = None,
                 n_partitions: Optional[int] = None):
        """materialize=True yields dense image/answers/votes arrays (host
        mode); False yields index batches (image_row + sparse label
        entries) for device-cache mode, shrinking the per-batch H2D volume
        by ~1000x.

        partitions: optional (n_questions,) chip id per question for a
        mesh-SHARDED feature cache (parallel/sharded_cache.py). Every
        batch is then built so its i-th equal slice contains only chip
        i's questions, making the feature gather communication-free.
        Partitioned mode ignores drop_last: short pool segments are
        always padded with mask=0 repeats (the loss and scoring are
        mask-aware), so each epoch visits every question exactly once.
        """
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.materialize = materialize
        self.partitions = partitions
        if partitions is not None:
            # n_partitions must equal the mesh size even when some chips'
            # images back no questions (their pools stay empty)
            self.n_parts = n_partitions or int(partitions.max()) + 1
            if batch_size % self.n_parts:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by "
                    f"{self.n_parts} cache shards")
            self._pools = [np.flatnonzero(partitions == c)
                           for c in range(self.n_parts)]
        # Per-epoch deterministic shuffle: epoch e's order is a pure
        # function of (seed, e), NOT of how many epochs were iterated
        # before — so a run resumed from an epoch-k checkpoint sees
        # exactly the batches the uninterrupted run would have seen
        # (bit-exact resume; the standard deterministic-data-pipeline
        # design for preemptible TPU training). A single stateful rng
        # here would re-deal epoch 1's cards to the resumed epoch k+1.
        self.seed = seed
        self._epoch = 0
        self._skip_next = 0

    def set_epoch(self, epoch: int, skip: int = 0) -> None:
        """Fast-forward the per-epoch shuffle counter (resume support:
        fit() calls this with the checkpoint's start epoch so the next
        iteration shuffles as epoch start+1, not epoch 1).

        skip > 0 additionally drops the first `skip` batches of the NEXT
        iteration only (mid-epoch resume: a checkpoint written at an
        eval_interval boundary records how many batches of its epoch were
        already trained; the resumed run must see exactly the remaining
        ones). Skipping is index arithmetic — no batch is materialized."""
        self._epoch = int(epoch)
        self._skip_next = int(skip)

    def __len__(self) -> int:
        n = self.ds.n_questions
        if self.partitions is not None:
            # partitioned mode always pads short pools with mask=0 rows
            # (the train loss and scoring are mask-aware), so drop_last is
            # ignored and every question is visited exactly once/epoch
            per = self.batch_size // self.n_parts
            return max(-(-len(p) // per) for p in self._pools)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_rng(self) -> np.random.Generator:
        return np.random.default_rng([self.seed, self._epoch])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        self._epoch += 1
        skip, self._skip_next = self._skip_next, 0  # one-shot
        if self.partitions is not None:
            yield from self._iter_partitioned(skip)
            return
        n = self.ds.n_questions
        order = np.arange(n)
        if self.shuffle:
            self._epoch_rng().shuffle(order)
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(skip * bs, stop, bs):
            rows = order[start:start + bs]
            yield self._make_batch(rows)

    def _iter_partitioned(self, skip: int = 0
                          ) -> Iterator[Dict[str, np.ndarray]]:
        per = self.batch_size // self.n_parts
        pools = [p.copy() for p in self._pools]
        if self.shuffle:
            rng = self._epoch_rng()
            for p in pools:
                rng.shuffle(p)
        n_batches = len(self)
        for b in range(skip, n_batches):
            rows, valid = [], []
            for p in pools:
                seg = p[b * per:(b + 1) * per]
                nv = len(seg)
                if nv < per:  # pad with repeats of the pool head, mask 0
                    filler = p[np.arange(per - nv) % max(len(p), 1)] \
                        if len(p) else np.zeros(per - nv, np.int64)
                    seg = np.concatenate([seg, filler])
                rows.append(seg)
                valid.append(nv)
            batch = self._make_batch(np.concatenate(rows))
            mask = np.zeros((self.batch_size,), np.float32)
            for c, nv in enumerate(valid):
                mask[c * per:c * per + nv] = 1.0
            batch["mask"] = mask
            yield batch

    def _make_batch(self, rows: np.ndarray) -> Dict[str, np.ndarray]:
        ds, bs = self.ds, self.batch_size
        valid = len(rows)
        if valid < bs:  # pad final batch to fixed shape
            rows = np.concatenate(
                [rows, np.zeros(bs - valid, dtype=rows.dtype)])
        t = ds.table
        mask = np.zeros((bs,), dtype=np.float32)
        mask[:valid] = 1.0
        batch = {
            "question": t.tokens[rows],
            "qlen": t.qlen[rows],
            "qid": t.qid[rows],
            "mask": mask,
            "index": rows.astype(np.int64),
        }
        if self.materialize:
            a, v = t.dense_answers(rows)
            batch.update(
                answers=a, votes=v,
                image=ds.store.batch(t.image_row[rows]))
        else:
            batch.update(
                image_row=t.image_row[rows],
                ans_idx=t.ans_idx[rows], ans_score=t.ans_score[rows],
                vote_idx=t.vote_idx[rows], vote_val=t.vote_val[rows])
        return batch


def pack_index_batch(batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Pack an index batch's device-bound fields into TWO arrays.

    Through the tunneled TPU every device_put is a separate RPC with
    ~fixed latency; sending 8 small arrays per step costs more than the
    step itself. Layout (S = answer-slot capacity, T = max_qlen):
      ints   (B, T+2+2S) int32:  [question | qlen | image_row | ans_idx
                                  | vote_idx]
      floats (B, 2S+1)  float32: [ans_score | vote_val | mask]
    Host-only fields (qid, index) are intentionally dropped — readers
    keep the host batch. Unpacked on device by steps.unpack_index_batch.
    """
    return {
        "ints": np.concatenate([
            batch["question"].astype(np.int32),
            batch["qlen"][:, None].astype(np.int32),
            batch["image_row"][:, None].astype(np.int32),
            batch["ans_idx"].astype(np.int32),
            batch["vote_idx"].astype(np.int32),
        ], axis=1),
        "floats": np.concatenate([
            batch["ans_score"].astype(np.float32),
            batch["vote_val"].astype(np.float32),
            batch["mask"][:, None].astype(np.float32),
        ], axis=1),
    }


def prefetch_to_device(iterator, put_fn, depth: int = 2):
    """Wrap a host batch iterator with a background thread that stages
    `depth` batches ahead through put_fn (e.g. a sharded jax.device_put),
    overlapping host assembly + H2D with device compute."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def worker():
        try:
            for item in iterator:
                q.put(put_fn(item))
        except BaseException as e:  # propagate into consumer
            err.append(e)
        finally:
            q.put(sentinel)

    th = threading.Thread(target=worker, daemon=True)
    th.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
