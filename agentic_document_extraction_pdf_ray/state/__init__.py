from .manifest import (  # noqa: F401
    done_partitions, input_fingerprint, load_manifests, write_manifest,
)
