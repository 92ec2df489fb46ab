"""DOCX-style document source → line-paginated page rows (text payload).

Ray-Data-native analogue of the reference's ``DocxProcessor``
(``/root/reference/src/preprocessing/docx_processor.py:43-235``):

- line extraction (``_extract_text_lines`` :137): paragraphs become lines
  (blank paragraphs preserved for spacing); tables append a blank line,
  then one ``" | "``-joined line per table row, then a blank line;
- pagination (``_render_text_to_pages`` :178): pages hold
  ``LINES_PER_PAGE = (3300 - 2*150) // 36 = 83`` lines; an empty document
  still yields one empty page;
- page text (``_render_page`` text_content): ``"\\n"``-joined lines.

python-docx is absent in this container, so ``.docx`` byte parsing is an
import-gated stub; the pagination core is pure, and the Ray plumbing is
real and tested over plain-text files (one paragraph per line) — the
text-payload equivalent the rest of the engine consumes.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from .fileid import file_id

LINES_PER_PAGE = (3300 - 2 * 150) // 36        # 83, reference geometry

PAGE_SCHEMA = pa.schema([
    ("file", pa.string()),
    ("page_number", pa.int32()),
    ("n_lines", pa.int32()),
    ("text", pa.string()),
])


def docx_text_lines(paragraphs: list[str],
                    tables: list[list[list[str]]] | None = None) -> list[str]:
    """Pure line-extraction core (reference ``_extract_text_lines``)."""
    lines: list[str] = []
    for para in paragraphs:
        text = para.strip()
        lines.append(text if text else "")
    for table in tables or []:
        lines.append("")
        for row in table:
            lines.append(" | ".join(cell.strip() for cell in row))
        lines.append("")
    return lines


def paginate_lines(lines: list[str],
                   lines_per_page: int = LINES_PER_PAGE) -> list[dict]:
    """Pure pagination core (reference ``_render_text_to_pages``)."""
    chunks: list[list[str]] = []
    for i in range(0, max(len(lines), 1), lines_per_page):
        chunk = lines[i:i + lines_per_page]
        if chunk:
            chunks.append(chunk)
    if not chunks:
        chunks = [[""]]
    return [{"page_number": i + 1, "n_lines": len(chunk),
             "text": "\n".join(chunk)}
            for i, chunk in enumerate(chunks)]


def parse_docx_bytes(data: bytes) -> list[str]:
    """.docx → paragraph lines; python-docx absent → import-gated stub."""
    try:
        import docx  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "DOCX parsing requires python-docx, which is not available in "
            "this environment; plain-text documents are fully supported"
        ) from e
    import io                                     # pragma: no cover
    d = docx.Document(io.BytesIO(data))           # pragma: no cover
    return docx_text_lines(
        [p.text for p in d.paragraphs],
        [[[c.text for c in row.cells] for row in t.rows]
         for t in d.tables])                      # pragma: no cover


def doc_pages_batch(batch: pa.Table) -> pa.Table:
    """map_batches body over ``read_binary_files(include_paths=True)``:
    .docx via the gated parser, anything else as paragraph-per-line text."""
    out: list[dict] = []
    for path, data in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        if os.path.splitext(path)[1].lower() in (".docx", ".doc"):
            lines = parse_docx_bytes(data)
        else:
            raw = data.decode("utf-8", errors="replace")
            lines = docx_text_lines(raw.split("\n"))
        for p in paginate_lines(lines):
            out.append({"file": file_id(path), **p})
    return pa.table({
        "file": pa.array([r["file"] for r in out], pa.string()),
        "page_number": pa.array([r["page_number"] for r in out], pa.int32()),
        "n_lines": pa.array([r["n_lines"] for r in out], pa.int32()),
        "text": pa.array([r["text"] for r in out], pa.string()),
    }, schema=PAGE_SCHEMA)


def read_doc_pages(paths: str | list[str]) -> ray.data.Dataset:
    """Document files → line-paginated page rows."""
    path_list = [paths] if isinstance(paths, str) else list(paths)
    ds = ray.data.read_binary_files(path_list, include_paths=True)
    return ds.map_batches(doc_pages_batch, batch_format="pyarrow")


# ------------------------------------------------------- deterministic fixture

TXT_FIXTURE_PATH = "/tmp/ray_extract_cache/docpages_fixture.txt"
_WORDS = ("claim", "record", "billing", "provider", "insurance", "review",
          "approval", "codes", "totals", "dates")


def ensure_txt_fixture(path: str = TXT_FIXTURE_PATH,
                       n_lines: int = 200) -> str:
    """Deterministic paragraph-per-line text fixture. Each line embeds its
    own index (``para NNNN ...``) so the DuckDB oracle can reconstruct
    line order and pagination without file row numbers. 200 lines → 3
    pages of 83/83/34 at the reference geometry."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    lines = []
    for i in range(n_lines):
        w = " ".join(_WORDS[(i * 3 + j) % len(_WORDS)] for j in range(6))
        lines.append(f"para {i:04d} {w}")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        # no trailing newline: a final "\n" would read back as one extra
        # empty paragraph on the Ray side that the oracle cannot see
        f.write("\n".join(lines))
    os.replace(tmp, path)
    return path
