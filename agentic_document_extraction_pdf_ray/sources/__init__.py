from .transcripts import generate_transcripts, transcripts_path  # noqa: F401


def read_pages_auto(paths):
    """Format-routing source dispatch (the FileProcessorFactory analogue,
    ``/root/reference/src/preprocessing/file_processor.py`` — suffix →
    processor). Groups input paths by suffix, reads each group with its
    source, and unions the page streams (all sources share the
    (file, page_number, text) core columns)."""
    import os

    from .docpages import read_doc_pages
    from .htmlpages import read_html_pages
    from .spreadsheet import read_spreadsheets

    path_list = [paths] if isinstance(paths, str) else list(paths)
    groups: dict[str, list[str]] = {}
    for p in path_list:
        suffix = os.path.splitext(p)[1].lower()
        if suffix in (".csv", ".xlsx"):
            groups.setdefault("sheet", []).append(p)
        elif suffix in (".docx", ".doc", ".txt", ".md"):
            groups.setdefault("doc", []).append(p)
        elif suffix in (".html", ".htm"):
            groups.setdefault("html", []).append(p)
        else:
            raise ValueError(f"no source registered for {suffix!r} ({p})")

    readers = {"sheet": read_spreadsheets, "doc": read_doc_pages,
               "html": read_html_pages}
    datasets = []
    for kind in ("sheet", "doc", "html"):
        if kind in groups:
            ds = readers[kind](groups[kind])
            datasets.append(ds.map_batches(
                lambda b: b.select(["file", "page_number", "text"]),
                batch_format="pyarrow"))
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out
