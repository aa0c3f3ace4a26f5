from .observability import RunManifest, config_hash, trace  # noqa: F401
