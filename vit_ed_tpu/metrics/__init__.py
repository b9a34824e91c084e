from .wi19 import get_metrics
from .map_prak import calc_map_prak

__all__ = ["calc_map_prak", "get_metrics"]
