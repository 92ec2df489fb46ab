from .transcripts import generate_transcripts, transcripts_path  # noqa: F401
