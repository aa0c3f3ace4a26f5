from .ppl import compute_ppl  # noqa: F401
