from .piece import Location, PuzzlePiece, PuzzlePieceRotation, PuzzlePieceSide
from .importer import Puzzle, PuzzleResultsCollection, PuzzleSolver, PuzzleType
from .solver import PaikinTalSolver
from .driver import paikin_tal_driver

__all__ = [
    "Location",
    "PaikinTalSolver",
    "Puzzle",
    "PuzzlePiece",
    "PuzzlePieceRotation",
    "PuzzlePieceSide",
    "PuzzleResultsCollection",
    "PuzzleSolver",
    "PuzzleType",
    "paikin_tal_driver",
]
