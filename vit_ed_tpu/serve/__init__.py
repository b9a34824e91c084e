from .export import (ExportedScorer, FORMAT_VERSION, STAGES, export_scorer,
                     load_scorer, stage_fns)
from .scan import scan_pairs

__all__ = ["ExportedScorer", "FORMAT_VERSION", "STAGES", "export_scorer",
           "load_scorer", "scan_pairs", "stage_fns"]
