"""Sequence packing: tokenized documents -> fixed-length training
sequences (the last step of a pretraining data pipeline).

Each partition's documents are concatenated as ``tokens + [eos_id]``
and re-chunked into rows of exactly ``seq_len`` tokens; the final
partial chunk is padded with ``pad_id``.  All kernel work is
numpy-whole-array inside ``mapInArrow`` (one boolean-mask fill + one
reshape per batch) — no per-token Python.

Scale shape: map-only (zero shuffle) — parallelism = input partitions;
each task holds at most seq_len-1 carried tokens between batches.
Packing is order-sensitive by nature; for a deterministic layout feed
it a sorted/repartitioned input (the driver query sorts by doc_id in
one partition).  Each sequence carries (n_docs = documents ENDING in
it, n_pad, first_doc_id) lineage so sampling audits can trace windows
back to documents.  Pick ``eos_id`` outside the vocabulary so counts
are unambiguous.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, types as T

ARROW_OUT = pa.schema([
    pa.field("seq_id", pa.int64()),
    pa.field("tokens", pa.list_(pa.int32())),
    pa.field("n_docs", pa.int32()),
    pa.field("n_pad", pa.int32()),
    pa.field("first_doc_id", pa.string()),
])


def pack_sequences(tok_df: DataFrame, seq_len: int = 2048,
                   eos_id: int = 50257, pad_id: int = 0,
                   token_col: str = "tokens",
                   id_col: str = "doc_id") -> DataFrame:
    """-> (seq_id, tokens array<int> of length seq_len, n_docs, n_pad,
    first_doc_id).  seq_id is unique per (partition, position)."""
    out_schema = T.StructType([
        T.StructField("seq_id", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("n_pad", T.IntegerType()),
        T.StructField("first_doc_id", T.StringType()),
    ])

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext
        from orc_spark._alloc import tune_worker
        tune_worker()
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        seq_base = pid * 1_000_000_000
        emitted = 0
        carry = np.empty(0, dtype=np.int32)
        # per-sequence lineage: global stream offset at which each
        # not-yet-passed document starts, parallel to its doc_id —
        # pruned to the emitted frontier so memory stays O(docs in
        # flight), never O(partition)
        doc_starts = np.empty(0, dtype=np.int64)
        doc_ids: list[str] = []
        appended = 0  # tokens (incl. eos slots) ever appended

        def owner_ids(seq_starts: np.ndarray) -> list[str]:
            idx = np.searchsorted(doc_starts, seq_starts, side="right") - 1
            return [doc_ids[i] if 0 <= i < len(doc_ids) else ""
                    for i in idx]

        def prune_docs():
            nonlocal doc_starts, doc_ids
            frontier = emitted * seq_len
            keep_from = max(
                int(np.searchsorted(doc_starts, frontier,
                                    side="right")) - 1, 0)
            if keep_from:
                doc_starts = doc_starts[keep_from:]
                doc_ids = doc_ids[keep_from:]

        def emit_full():
            nonlocal carry, emitted
            n_full = len(carry) // seq_len
            if n_full == 0:
                return None
            body = carry[:n_full * seq_len].reshape(n_full, seq_len)
            carry = carry[n_full * seq_len:]
            offsets = np.arange(0, (n_full + 1) * seq_len, seq_len,
                                dtype=np.int32)
            toks = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(body.reshape(-1)))
            seq_starts = (emitted + np.arange(n_full)) * seq_len
            out = pa.RecordBatch.from_arrays([
                pa.array(seq_base + emitted + np.arange(n_full),
                         pa.int64()),
                toks,
                pa.array((body == eos_id).sum(axis=1).astype(np.int32)),
                pa.array(np.zeros(n_full, np.int32)),
                pa.array(owner_ids(seq_starts)),
            ], schema=ARROW_OUT)
            emitted += n_full
            prune_docs()
            return out

        for batch in batches:
            if batch.num_rows == 0:
                continue
            toks = batch.column(token_col)
            lens = toks.value_lengths().fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            starts = appended + np.concatenate(
                [[0], np.cumsum(lens + 1)[:-1]])
            doc_starts = np.concatenate([doc_starts, starts])
            doc_ids.extend(str(v) for v in
                           batch.column(id_col).to_pylist())
            appended += int(lens.sum()) + len(lens)
            flat = np.asarray(toks.flatten()).astype(np.int32)
            # one vector fill: eos slot after every document
            with_eos = np.full(int(lens.sum()) + len(lens), eos_id,
                               dtype=np.int32)
            mask = np.ones(len(with_eos), dtype=bool)
            mask[np.cumsum(lens + 1) - 1] = False
            with_eos[mask] = flat
            carry = np.concatenate([carry, with_eos]) if len(carry) \
                else with_eos
            out = emit_full()
            if out is not None:
                yield out
        if len(carry):
            n_pad = seq_len - len(carry)
            row = np.full(seq_len, pad_id, dtype=np.int32)
            row[:len(carry)] = carry
            n_docs = int((row[:seq_len - n_pad] == eos_id).sum())
            yield pa.RecordBatch.from_arrays([
                pa.array([seq_base + emitted], pa.int64()),
                pa.ListArray.from_arrays(
                    pa.array(np.array([0, seq_len], np.int32)),
                    pa.array(row)),
                pa.array([n_docs], pa.int32()),
                pa.array([n_pad], pa.int32()),
                pa.array(owner_ids(np.array([emitted * seq_len]))),
            ], schema=ARROW_OUT)

    return tok_df.select(id_col, token_col).mapInArrow(kernel, out_schema)
