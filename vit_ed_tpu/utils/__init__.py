from .logger import create_logger
from .misc import (
    AverageMeter,
    CalTimer,
    UnableToCrop,
    chunks,
    cosine_distance_np,
    get_combinations,
    list_to_idx,
    set_seed,
    split_list_by_ratios,
)

__all__ = [
    "AverageMeter",
    "CalTimer",
    "UnableToCrop",
    "chunks",
    "cosine_distance_np",
    "create_logger",
    "get_combinations",
    "list_to_idx",
    "set_seed",
    "split_list_by_ratios",
]
