import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def tiny_transcripts(tmp_path_factory):
    """~1k-turn deterministic transcript fixture (FIXTURES.md 'tiny')."""
    from agentic_document_extraction_pdf_ray.sources.transcripts import generate_transcripts
    d = tmp_path_factory.mktemp("tiny_transcripts")
    generate_transcripts(str(d), 1000, seed=42, mega_convs=0)
    return str(d)


@pytest.fixture(scope="session")
def tiny_golden(tiny_transcripts):
    """Oracle output over the tiny fixture, (conv_id, turn_idx)-ordered."""
    import pyarrow.parquet as pq
    from agentic_document_extraction_pdf_ray.oracle.core import oracle_extract_table
    rows = pq.read_table(tiny_transcripts).to_pylist()
    return oracle_extract_table(rows)
