"""Frozen-golden regression gate.

``tests/golden/golden_tiny.parquet`` is the oracle's output over a fixed
500-turn fixture (seed 123), committed to the repo. If a future change
alters the extraction semantics, this test fails — forcing the change to
be either fixed or consciously re-frozen (regenerate via the snippet in
the module docstring of the golden writer, mirroring the reference's
versioned golden-dataset regression gate,
``/root/reference/src/evaluation/golden_dataset.py:24-117``).

Regenerate (ONLY for intentional semantic changes):
    python - <<'PY'
    # see git log for the original generation snippet
    PY
"""

import pyarrow.parquet as pq


def test_oracle_matches_frozen_golden(tmp_path):
    from agentic_document_extraction_pdf_ray.oracle.core import oracle_extract_table
    from agentic_document_extraction_pdf_ray.sources.transcripts import generate_transcripts

    d = tmp_path / "fixture"
    generate_transcripts(str(d), 500, seed=123, mega_convs=0)
    rows = pq.read_table(str(d)).to_pylist()
    golden = {(r["conv_id"], r["turn_idx"]): r
              for r in oracle_extract_table(rows)}

    frozen = pq.read_table("tests/golden/golden_tiny.parquet").to_pylist()
    assert len(frozen) == len(golden)
    for f in frozen:
        key = (f["conv_id"], f["turn_idx"])
        g = golden[key]
        assert g["extracted_text"] == f["extracted_text"], key
        spans = str([(s["start"], s["end"], s["label"]) for s in g["spans"]])
        assert spans == f["spans_json"], key
        assert str(sorted(g["fields"].items())) == f["fields_json"], key
        assert ",".join(g["flags"]) == f["flags"], key
        assert g["confidence"] == f["confidence"], key
        assert g["segment_id"] == f["segment_id"], key
        dup = -1 if g["dup_of"] is None else g["dup_of"]["turn_idx"]
        assert dup == f["dup_turn"], key
