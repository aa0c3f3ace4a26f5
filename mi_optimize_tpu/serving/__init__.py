from .engine import decode_loop, decode_step, generate, init_cache, prefill  # noqa: F401
from .flatdecode import decode_loop_flat, stack_cache_flat, stack_flat  # noqa: F401
from .optimize import fuse_for_serving  # noqa: F401
from .speculative import speculative_generate  # noqa: F401
