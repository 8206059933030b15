from .analysis import bars_analysis

__all__ = ["bars_analysis"]
