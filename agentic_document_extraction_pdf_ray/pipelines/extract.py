"""Flagship extraction pipeline: transcripts → extracted turns.

Physical plan (SURVEY.md §3.4 / §4.2):

    read_parquet(transcripts)                      # streaming source
      .map_batches(extract_turn_batch, pyarrow)    # stateless per-turn core
      .groupby("conv_id").map_groups(conv_finalize)  # ONE hash shuffle
      [.write_parquet(partition_cols=["partition_id"])]  # resumable sink

The only all-to-all exchange is the ``groupby(conv_id)``; every other stage
is a streaming, zero-copy Arrow map. Mega-conversation skew is handled by
the salted two-phase variant in :mod:`.scale` (associative formulation of
the same semantics).
"""

from __future__ import annotations

import zlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.extract import conv_finalize, conv_summary, extract_turn_batch

DEFAULT_BATCH_SIZE = 4096


def read_transcripts(paths: str | list[str]) -> ray.data.Dataset:
    """Source: only the columns the pipeline touches leave storage."""
    return ray.data.read_parquet(
        paths, columns=["conv_id", "turn_idx", "role", "text", "tool"])


def extract_turns(ds: ray.data.Dataset,
                  batch_size: int = DEFAULT_BATCH_SIZE) -> ray.data.Dataset:
    """Per-turn stage only (no conversation semantics). Streaming, no shuffle."""
    return ds.map_batches(extract_turn_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def extract_pipeline(paths: str | list[str],
                     batch_size: int = DEFAULT_BATCH_SIZE) -> ray.data.Dataset:
    """Full pipeline: per-turn core + conversation-scoped finalize."""
    ds = extract_turns(read_transcripts(paths), batch_size)
    return ds.groupby("conv_id").map_groups(conv_finalize, batch_format="pyarrow")


def conv_summaries(paths: str | list[str],
                   batch_size: int = DEFAULT_BATCH_SIZE) -> ray.data.Dataset:
    """Conversation-level aggregate table."""
    ds = extract_turns(read_transcripts(paths), batch_size)

    def finalize_and_summarize(group: pa.Table) -> pa.Table:
        return conv_summary(conv_finalize(group))

    return ds.groupby("conv_id").map_groups(finalize_and_summarize,
                                            batch_format="pyarrow")


def add_partition_id(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """Deterministic output-partition key: crc32(conv_id) % P.

    Aligns the resume unit with the shuffle unit (SURVEY.md §7.4).
    """
    def _assign(batch: pa.Table) -> pa.Table:
        pids = [f"{zlib.crc32(c.encode()) % num_partitions:05d}"
                for c in batch["conv_id"].to_pylist()]
        return batch.append_column("partition_id", pa.array(pids, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")


def sort_output(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stable (conv_id, turn_idx) order for diffable/equality-checked output."""
    return ds.sort(["conv_id", "turn_idx"])
