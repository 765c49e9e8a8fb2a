from .spline import CubicSpline
from .thermal import (
    neq_integral, J10_integral, J11_integral, J20_integral, J30_integral,
    J31_integral, E_mod_integral, P_mod_integral,
)
from .deltaf import DeltafData
from . import lrf

__all__ = [
    "CubicSpline",
    "neq_integral", "J10_integral", "J11_integral", "J20_integral",
    "J30_integral", "J31_integral", "E_mod_integral", "P_mod_integral",
    "DeltafData",
    "lrf",
]
