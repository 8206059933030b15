from .scalars import guarded_ratio, nullif_zero, round_half_up

__all__ = ["guarded_ratio", "nullif_zero", "round_half_up"]
