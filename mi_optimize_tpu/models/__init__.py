from .quant_linear import QuantSpec, QuantizedLinear, quant_linear_apply  # noqa: F401
from . import llama  # noqa: F401
