"""Table-region detection + pipe-table parsing.

The table/region-detection half of the north-star layout story: the
block segmenter (:mod:`.segmentation`) already LABELS pipe-dense blocks
(they are excluded from main prose); this module turns those regions
into STRUCTURED tables — header + row cells — the way the reference's
layout analysis promotes table regions to structured extractions
(``/root/reference/src/pipeline/layout_types.py`` table regions;
spreadsheet text rendering ``src/preprocessing/spreadsheet_processor.py``
is the inverse operation). Markdown separator rows (``|---|---|``) are
recognized and skipped.

Pure functions + a stateless ``map_batches`` stage.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyarrow as pa

from .segmentation import _BLOCK_RE

_MD_SEP_CELL_RE = re.compile(r"^:?-{3,}:?$")


@dataclass(frozen=True)
class TableRegion:
    start: int                      # offsets into the cleaned text
    end: int
    header: tuple[str, ...]
    rows: tuple[tuple[str, ...], ...]

    @property
    def n_rows(self) -> int:
        return len(self.rows)

    @property
    def n_cols(self) -> int:
        return len(self.header)


def _split_row(line: str) -> list[str]:
    cells = [c.strip() for c in line.split("|")]
    # leading/trailing pipes produce empty edge cells — drop them
    if cells and cells[0] == "":
        cells = cells[1:]
    if cells and cells[-1] == "":
        cells = cells[:-1]
    return cells


def _is_md_separator(cells: list[str]) -> bool:
    return bool(cells) and all(_MD_SEP_CELL_RE.match(c) for c in cells)


def parse_pipe_table(text: str) -> TableRegion | None:
    """Parse one block as a pipe table; None when it isn't one.

    A table block has ≥2 lines, ≥50% of lines with ≥2 pipe-delimited
    cells, and a consistent-enough column count (rows are padded or
    truncated to the header width, mirroring the reference's row
    rendering which pads to ``num_cols``)."""
    lines = [ln for ln in text.split("\n") if ln.strip()]
    if len(lines) < 2:
        return None
    # Detection: ≥50% of lines carry a pipe (more permissive than the
    # prose classifiers' two-pipe heuristic — the PARSER must also catch
    # two-column tables, whose rows have a single pipe); the ≥2-column
    # header check below rejects prose with a stray pipe.
    if sum(1 for ln in lines if "|" in ln) * 2 < len(lines):
        return None
    parsed = [_split_row(ln) for ln in lines if "|" in ln]
    header = parsed[0]
    width = len(header)
    if width < 2:
        return None
    rows: list[tuple[str, ...]] = []
    for cells in parsed[1:]:
        if _is_md_separator(cells):
            continue
        cells = (cells + [""] * width)[:width]
        rows.append(tuple(cells))
    return TableRegion(0, len(text), tuple(header), tuple(rows))


def extract_table_regions(cleaned: str) -> list[TableRegion]:
    """All table regions of a cleaned payload, with stable offsets."""
    out: list[TableRegion] = []
    for m in _BLOCK_RE.finditer(cleaned or ""):
        t = parse_pipe_table(m.group(0))
        if t is not None:
            out.append(TableRegion(m.start(), m.end(), t.header, t.rows))
    return out


def table_regions_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches stage: one output row per detected table
    region (conv/turn provenance + shape + flattened cells)."""
    conv = batch["conv_id"].to_pylist()
    tix = batch["turn_idx"].to_pylist()
    texts = batch["text"].to_pylist()
    o_conv, o_tix, o_start, o_end = [], [], [], []
    o_header, o_rows, o_ncols = [], [], []
    for c, t, x in zip(conv, tix, texts):
        for reg in extract_table_regions(x or ""):
            o_conv.append(c)
            o_tix.append(t)
            o_start.append(reg.start)
            o_end.append(reg.end)
            o_header.append(list(reg.header))
            o_rows.append(reg.n_rows)
            o_ncols.append(reg.n_cols)
    return pa.table({
        "conv_id": pa.array(o_conv, pa.string()),
        "turn_idx": pa.array(o_tix, pa.int32()),
        "start": pa.array(o_start, pa.int32()),
        "end": pa.array(o_end, pa.int32()),
        "header": pa.array(o_header, pa.list_(pa.string())),
        "n_rows": pa.array(o_rows, pa.int32()),
        "n_cols": pa.array(o_ncols, pa.int32()),
    })
