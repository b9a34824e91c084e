from .client import ServeClient, ServeError
from .export import (ExportedScorer, FORMAT_VERSION, STAGES, export_scorer,
                     load_scorer, stage_fns)
from .scan import scan_pairs
from .server import BundleServer, DynamicBatcher

__all__ = ["BundleServer", "DynamicBatcher", "ExportedScorer",
           "FORMAT_VERSION", "STAGES", "ServeClient", "ServeError",
           "export_scorer", "load_scorer", "scan_pairs", "stage_fns"]
