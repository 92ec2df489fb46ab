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

from ..stages.extract import (
    conv_finalize, conv_finalize_block, conv_summary, conv_summary_block,
    extract_turn_batch,
)

DEFAULT_BATCH_SIZE = 4096
DEFAULT_PARTITIONS = 64


def read_transcripts(paths: str | list[str]) -> ray.data.Dataset:
    """Source: only the columns the pipeline touches leave storage."""
    return ray.data.read_parquet(
        paths, columns=["conv_id", "turn_idx", "role", "text", "tool"])


def extract_turns(ds: ray.data.Dataset,
                  batch_size: int = DEFAULT_BATCH_SIZE) -> ray.data.Dataset:
    """Per-turn stage only (no conversation semantics). Streaming, no shuffle."""
    return ds.map_batches(extract_turn_batch, batch_format="pyarrow",
                          batch_size=batch_size)


def _with_partition_id(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    def _assign(batch: pa.Table) -> pa.Table:
        pids = [f"{zlib.crc32(c.encode()) % num_partitions:05d}"
                for c in batch["conv_id"].to_pylist()]
        return batch.append_column("partition_id", pa.array(pids, pa.string()))
    return ds.map_batches(_assign, batch_format="pyarrow")


def extract_pipeline(paths: str | list[str],
                     batch_size: int = DEFAULT_BATCH_SIZE,
                     num_partitions: int = DEFAULT_PARTITIONS,
                     keep_partition_id: bool = False) -> ray.data.Dataset:
    """Full pipeline: per-turn core + conversation-scoped finalize.

    The conversation shuffle is ONE groupby on ``partition_id =
    crc32(conv_id) % P`` — each bucket is finalized by a single task doing a
    linear multi-conversation scan (no per-group scheduling overhead), and
    the same bucket id doubles as the resumable-output partition key.
    """
    ds = extract_turns(read_transcripts(paths), batch_size)
    ds = _with_partition_id(ds, num_partitions)
    out = ds.groupby("partition_id").map_groups(conv_finalize_block,
                                                batch_format="pyarrow")
    if not keep_partition_id:
        out = out.drop_columns(["partition_id"])
    return out


def conv_summaries(paths: str | list[str],
                   batch_size: int = DEFAULT_BATCH_SIZE,
                   num_partitions: int = DEFAULT_PARTITIONS) -> ray.data.Dataset:
    """Conversation-level aggregate table."""
    ds = extract_turns(read_transcripts(paths), batch_size)
    ds = _with_partition_id(ds, num_partitions)
    return ds.groupby("partition_id").map_groups(
        lambda part: conv_summary_block(part.drop_columns(["partition_id"])),
        batch_format="pyarrow")


def add_partition_id(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """Deterministic output-partition key: crc32(conv_id) % P.

    Aligns the resume unit with the shuffle unit (SURVEY.md §7.4).
    """
    return _with_partition_id(ds, num_partitions)


def sort_output(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Stable (conv_id, turn_idx) order for diffable/equality-checked output."""
    return ds.sort(["conv_id", "turn_idx"])
