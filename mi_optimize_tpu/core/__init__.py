from . import packing, qparams  # noqa: F401
