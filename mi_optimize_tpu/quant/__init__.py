from .api import quantize  # noqa: F401
from .config import CalibrationConfig, QuantConfig  # noqa: F401
