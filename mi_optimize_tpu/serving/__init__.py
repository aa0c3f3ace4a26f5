from .engine import decode_loop, decode_step, generate, init_cache, prefill  # noqa: F401
