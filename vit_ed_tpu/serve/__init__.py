from .export import (ExportedScorer, FORMAT_VERSION, STAGES, export_scorer,
                     load_scorer, stage_fns)

__all__ = ["ExportedScorer", "FORMAT_VERSION", "STAGES", "export_scorer",
           "load_scorer", "stage_fns"]
