"""HTML file source → main-content page rows.

The HTML half of the north-star source matrix: files parse into DOM
block nodes, the readability-style scorer
(:mod:`..functions.html_extract`) drops boilerplate subtrees and
link-dense navigation, and the kept nodes become one main-content page
per document (HTML has no native pagination; downstream turn-level
chunking is the flagship core's job).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data

from ..functions.html_extract import html_main_text, parse_dom_nodes
from .fileid import file_id

PAGE_SCHEMA = pa.schema([
    ("file", pa.string()),
    ("page_number", pa.int32()),
    ("n_nodes", pa.int32()),         # DOM block nodes seen
    ("n_kept", pa.int32()),          # nodes kept as main content
    ("text", pa.string()),
])


def html_pages_batch(batch: pa.Table) -> pa.Table:
    out: list[dict] = []
    for path, data in zip(batch["path"].to_pylist(),
                          batch["bytes"].to_pylist()):
        html = data.decode("utf-8", errors="replace")
        nodes = parse_dom_nodes(html)
        out.append({
            "file": file_id(path),
            "page_number": 1,
            "n_nodes": len(nodes),
            "n_kept": sum(1 for n in nodes if n.kept),
            "text": "\n\n".join(n.text for n in nodes if n.kept),
        })
    return pa.table({
        "file": pa.array([r["file"] for r in out], pa.string()),
        "page_number": pa.array([r["page_number"] for r in out], pa.int32()),
        "n_nodes": pa.array([r["n_nodes"] for r in out], pa.int32()),
        "n_kept": pa.array([r["n_kept"] for r in out], pa.int32()),
        "text": pa.array([r["text"] for r in out], pa.string()),
    }, schema=PAGE_SCHEMA)


def read_html_pages(paths: str | list[str]) -> ray.data.Dataset:
    path_list = [paths] if isinstance(paths, str) else list(paths)
    ds = ray.data.read_binary_files(path_list, include_paths=True)
    return ds.map_batches(html_pages_batch, batch_format="pyarrow")


HTML_FIXTURE_PATH = "/tmp/ray_extract_cache/htmlpages_fixture.html"


def ensure_html_fixture(path: str = HTML_FIXTURE_PATH) -> str:
    """Deterministic HTML fixture: article prose wrapped in the usual
    boilerplate (nav/aside/footer/link farm) the scorer must strip."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    paras = "\n".join(
        f"<p>Claim record {i:03d} reviewed by provider with approval "
        f"totals and careful billing dates noted in the system.</p>"
        for i in range(12))
    html = (
        "<!DOCTYPE html><html><head><title>fixture</title>"
        "<script>var x=1;</script></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>Archive</a></nav>"
        f"<article><h1>Quarterly claims digest</h1>{paras}"
        "<p>Subscribe to our newsletter — click here!</p></article>"
        "<footer>Copyright. All rights reserved.</footer></body></html>")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(html)
    os.replace(tmp, path)
    return path


__all__ = ["read_html_pages", "html_pages_batch", "html_main_text",
           "ensure_html_fixture"]
