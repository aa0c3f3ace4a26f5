from .engine import decode_loop, decode_step, generate, init_cache, prefill  # noqa: F401
from .optimize import fuse_for_serving  # noqa: F401
