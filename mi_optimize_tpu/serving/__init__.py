from .engine import decode_step, generate, init_cache, prefill  # noqa: F401
