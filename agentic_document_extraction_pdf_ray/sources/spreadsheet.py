"""CSV / XLSX spreadsheet source → page rows (text payload).

Ray-Data-native analogue of the reference's ``SpreadsheetProcessor``
(``/root/reference/src/preprocessing/spreadsheet_processor.py:45-294``):

- validation: suffix ∈ {.csv, .xlsx}, size ≤ 50 MB (``validate`` :57);
- CSV reads as a single sheet named "Sheet1" (``_read_csv`` :141);
- paging (``_render_sheet`` :180): the first row is the header; data rows
  chunk into pages of ``MAX_ROWS_PER_PAGE`` with the header repeated on
  every page (a single-row sheet doubles as header AND data, mirroring
  the reference's ``rows[1:] if len(rows) > 1 else rows``);
- page text (``_render_table_page`` text_content): ``"Sheet: {name}"``
  followed by one ``" | "``-joined line per row.

The image render itself is N/A for a text engine — the text_content the
reference attaches to each ``PageImage`` IS the payload here.

Pipeline shape: ``ray.data.read_binary_files(include_paths=True)`` →
``flat_map``-style ``map_batches`` parse. One task per file; a corpus of
many files parallelizes by file. For TABULAR use (querying the data, not
paging it), use :func:`read_csv_table` — a column-pruned
``ray.data.read_csv`` that feeds the regular relational operators.
"""

from __future__ import annotations

import csv
import io
import os

import pyarrow as pa
import ray.data

from .fileid import file_id

MAX_ROWS_PER_PAGE = 50
MAX_FILE_SIZE_MB = 50

PAGE_SCHEMA = pa.schema([
    ("file", pa.string()),
    ("sheet", pa.string()),
    ("page_number", pa.int32()),
    ("n_rows", pa.int32()),          # data rows on the page (excl. header)
    ("text", pa.string()),
])


class SpreadsheetValidationError(ValueError):
    """Analogue of the reference's FileValidationError."""


def validate_spreadsheet(path: str) -> None:
    if not os.path.exists(path):
        raise SpreadsheetValidationError(f"File not found: {path}")
    suffix = os.path.splitext(path)[1].lower()
    if suffix not in (".xlsx", ".csv"):
        raise SpreadsheetValidationError(f"Not a spreadsheet: {suffix}")
    size_mb = os.path.getsize(path) / (1024 * 1024)
    if size_mb > MAX_FILE_SIZE_MB:
        raise SpreadsheetValidationError(
            f"File size {size_mb:.1f} MB exceeds limit of {MAX_FILE_SIZE_MB} MB")


def sheet_pages(rows: list[list[str]], sheet_name: str,
                start_page: int = 1) -> list[dict]:
    """Pure paging core (reference ``_render_sheet`` semantics)."""
    if not rows:
        return []
    header = rows[0]
    data_rows = rows[1:] if len(rows) > 1 else rows
    pages: list[dict] = []
    for chunk_idx in range(0, max(len(data_rows), 1), MAX_ROWS_PER_PAGE):
        chunk = data_rows[chunk_idx:chunk_idx + MAX_ROWS_PER_PAGE]
        page_rows = [header] + chunk if header else chunk
        lines = [f"Sheet: {sheet_name}"] + [" | ".join(r) for r in page_rows]
        pages.append({
            "sheet": sheet_name,
            "page_number": start_page + len(pages),
            "n_rows": len(chunk),
            "text": "\n".join(lines),
        })
    return pages


def parse_csv_bytes(data: bytes) -> list[list[str]]:
    text = data.decode("utf-8", errors="replace")
    return list(csv.reader(io.StringIO(text)))


def parse_xlsx_bytes(data: bytes) -> list[tuple[str, list[list[str]]]]:
    """XLSX → [(sheet_name, rows)]; openpyxl is absent in this container,
    so this is an import-gated stub with the reference's row semantics
    (stringify cells, skip all-empty rows) ready for when it is present."""
    try:
        from openpyxl import load_workbook
    except ImportError as e:                      # pragma: no cover
        raise NotImplementedError(
            "XLSX parsing requires openpyxl, which is not available in "
            "this environment; CSV is fully supported") from e
    wb = load_workbook(io.BytesIO(data), read_only=True, data_only=True)
    sheets = []
    for sheet_name in wb.sheetnames:              # pragma: no cover
        ws = wb[sheet_name]
        rows = []
        for row in ws.iter_rows(values_only=True):
            str_row = [str(c) if c is not None else "" for c in row]
            if any(cell.strip() for cell in str_row):
                rows.append(str_row)
        if rows:
            sheets.append((sheet_name, rows))
    wb.close()
    return sheets


def spreadsheet_pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches body over ``read_binary_files(include_paths=True)``
    output: parse every file into page rows."""
    out: list[dict] = []
    for path, data in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        suffix = os.path.splitext(path)[1].lower()
        if suffix == ".csv":
            sheets = [("Sheet1", parse_csv_bytes(data))]
        else:
            sheets = parse_xlsx_bytes(data)
        page_number = 1
        for sheet_name, rows in sheets:
            pages = sheet_pages(rows, sheet_name, page_number)
            page_number += len(pages)
            for p in pages:
                out.append({"file": file_id(path), **p})
    return pa.table({
        "file": pa.array([r["file"] for r in out], pa.string()),
        "sheet": pa.array([r["sheet"] for r in out], pa.string()),
        "page_number": pa.array([r["page_number"] for r in out], pa.int32()),
        "n_rows": pa.array([r["n_rows"] for r in out], pa.int32()),
        "text": pa.array([r["text"] for r in out], pa.string()),
    }, schema=PAGE_SCHEMA)


def read_spreadsheets(paths: str | list[str]) -> ray.data.Dataset:
    """Spreadsheet files → page-row Dataset (validates each path)."""
    path_list = [paths] if isinstance(paths, str) else list(paths)
    for p in path_list:
        validate_spreadsheet(p)
    ds = ray.data.read_binary_files(path_list, include_paths=True)
    return ds.map_batches(spreadsheet_pages_batch, batch_format="pyarrow")


def read_csv_table(paths: str | list[str], **read_csv_kwargs) -> ray.data.Dataset:
    """Tabular CSV path: stream rows as a typed table for the relational
    operators (column pruning via ``ray.data.read_csv`` options)."""
    return ray.data.read_csv(paths, **read_csv_kwargs)


# ------------------------------------------------------- deterministic fixture

CSV_FIXTURE_PATH = "/tmp/ray_extract_cache/spreadsheet_fixture.csv"
_FIXTURE_CATS = ("billing", "claims", "records", "support", "review")


def ensure_csv_fixture(path: str = CSV_FIXTURE_PATH,
                       n_rows: int = 403) -> str:
    """Deterministic CSV fixture (fixed content, independent of sf) used
    by the spreadsheet queries and their DuckDB oracles. 403 rows → 9
    pages with a 3-row final page, exercising the paging boundary."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = ["row_id,category,qty,price"]
    for i in range(1, n_rows + 1):
        cat = _FIXTURE_CATS[(i * 7 + 3) % len(_FIXTURE_CATS)]
        qty = (i * 13) % 40 + 1
        price = ((i * 37) % 9000 + 100) / 100.0
        lines.append(f"{i},{cat},{qty},{price:.2f}")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    os.replace(tmp, path)
    return path
