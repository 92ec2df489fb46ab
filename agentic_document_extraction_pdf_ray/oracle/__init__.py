from .core import oracle_extract_conversation, oracle_extract_table  # noqa: F401
