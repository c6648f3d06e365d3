from .wilson import WilsonOperator, d_plus_clover, clover_apply, gamma5, g5_d_plus_clover

__all__ = [
    "WilsonOperator",
    "d_plus_clover",
    "clover_apply",
    "gamma5",
    "g5_d_plus_clover",
]
