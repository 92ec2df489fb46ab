"""JSONL source/sink for transcript tables.

Completes the engine's interchange-format story (SURVEY §2.1
FileProcessorFactory routes suffixes to processors; reference analogue:
the JSON export path of ``/root/reference/src/export/
consolidated_export.py``): transcripts written as line-delimited JSON
(one turn per line, ISO-8601 µs timestamps) read back into the exact
Parquet schema, so every conversation pipeline runs unchanged on JSONL
drops. The reader is `ray.data.read_json` (streaming, block-parallel) +
one vectorized Arrow cast batch — no Python row loop.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def write_transcripts_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Sink: one JSON object per turn. Timestamps serialize as exact
    int64 µs-since-epoch (``ts_us`` — lossless and JSON-native; ISO
    strings would round-trip through two locale-sensitive parsers);
    everything else is native JSON."""
    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch["ts"], pa.int64())
        i = batch.schema.get_field_index("ts")
        return batch.remove_column(i).append_column("ts_us", ts_us)
    ds.map_batches(prep, batch_format="pyarrow").write_json(out_dir)


def read_transcripts_jsonl(path: str | list[str]) -> ray.data.Dataset:
    """Source: JSONL turns → the canonical transcript schema. The µs
    cast and the int32 narrow are single Arrow kernels per batch."""
    def coerce(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch["ts_us"], pa.int64()),
                     pa.timestamp("us"))
        return pa.table({
            "conv_id": pc.cast(batch["conv_id"], pa.string()),
            "turn_idx": pc.cast(batch["turn_idx"], pa.int32()),
            "role": pc.cast(batch["role"], pa.string()),
            "text": pc.cast(batch["text"], pa.string()),
            "tool": pc.cast(batch["tool"], pa.string()),
            "ts": ts})
    return ray.data.read_json(path).map_batches(coerce,
                                                batch_format="pyarrow")
