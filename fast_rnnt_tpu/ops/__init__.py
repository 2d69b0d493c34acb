from .numerics import logaddexp, safe_exp
from .recursion import (
    cummin,
    monotonic_lower_bound,
    mutual_information_recursion,
    register_impl,
)

__all__ = [
    "logaddexp",
    "safe_exp",
    "cummin",
    "monotonic_lower_bound",
    "mutual_information_recursion",
    "register_impl",
]
