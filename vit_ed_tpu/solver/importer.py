"""Puzzle import, reconstruction, and accuracy metrics.

Re-creates /root/reference/paikin_tal_solver/puzzle_importer.py (1861 LoC)
— image-to-pieces with erosion, reconstruction with wrong-placement
marking, standard/modified direct accuracy (BFS over candidate upper-left
origins), modified neighbor accuracy, results aggregation, and the
closed-form PuzzleTester fixture.
"""

from __future__ import annotations

import copy
import math
import os
import random
from enum import Enum
from typing import List, Optional

import numpy as np

from .piece import PuzzlePiece, PuzzlePieceRotation, PuzzlePieceSide


class PuzzleType(Enum):
    """type1: no rotation; type2: 90-degree rotations allowed."""

    type1 = 1
    type2 = 2


class ImageColor(Enum):
    black = 1


class PuzzleSolver(Enum):
    PaikinTal = "paikin_tal"
    MultiPuzzle = "multipuzzle"


class DirectAccuracyResultType(Enum):
    AccuracyScore = 1
    DifferentPuzzleScore = 2
    WrongRotationScore = 3
    WrongLocationScore = 4
    MissingPieceScore = 5


class ResultAccuracyMetric(Enum):
    StandardDirectAccuracy = 1
    ModifiedDirectAccuracy = 2
    ModifiedNeighborAccuracy = 3


class PieceDirectAccuracyResult(Enum):
    """BGR marker colors (puzzle_importer.py:1151-1159)."""

    different_puzzle = (255, 0, 0)
    correct_placement = (0, 204, 0)
    wrong_location = (0, 0, 255)
    wrong_rotation = (51, 153, 255)


class PieceSideNeighborAccuracyResult(Enum):
    correct_neighbor = (0, 204, 0)
    wrong_neighbor = (0, 0, 255)
    different_puzzle_id = (255, 0, 0)


class PieceSideBestBuddyAccuracyResult(Enum):
    """puzzle_importer.py:38-47."""

    wrong_best_buddy = (0, 0, 255)
    correct_best_buddy = (0, 204, 0)
    open_best_buddy = (255, 0, 0)
    no_best_buddy = (255, 255, 255)


class Puzzle:
    """A jigsaw puzzle: image -> grid of eroded LAB pieces
    (puzzle_importer.py:82-232)."""

    print_debug_messages = True
    DEFAULT_PIECE_WIDTH = 25
    NUMBER_BGR_DIMENSIONS = 3

    def __init__(self, id_number: int, image_filename: Optional[str] = None,
                 piece_width: Optional[int] = None, starting_piece_id: int = 0,
                 erosion: float = 0):
        self._id = id_number
        self._img = None
        self._img_LAB = None
        self._grid_size = None
        self._piece_width = piece_width if piece_width is not None else Puzzle.DEFAULT_PIECE_WIDTH
        self._erosion = erosion
        self._img_width = None
        self._img_height = None
        self._pieces: List[PuzzlePiece] = []
        # (piece_id, side, buddy_id, buddy_side) tuples attached by the
        # solver driver for the best-buddy accuracy metric
        self.best_buddy_pairs = None

        if image_filename is None:
            self._filename = ""
            return
        self._filename = image_filename
        self._load_puzzle_image()
        self.make_pieces(starting_piece_id)

    def _load_puzzle_image(self):
        import cv2

        if not os.path.exists(self._filename):
            raise ValueError(f'Invalid "{self._filename}" value.  File does not exist')
        self._img = cv2.imread(self._filename)  # BGR
        if self._img is None:
            raise IOError(f'Unable to load the image at "{self._filename}".')
        self._img_height, self._img_width = self._img.shape[:2]
        self._img_LAB = cv2.cvtColor(self._img, cv2.COLOR_BGR2LAB)

    def make_pieces(self, starting_id_numb=0):
        """Floor grid, center-shave, per-piece center-crop to
        ceil(w * (1 - erosion)) (puzzle_importer.py:182-232)."""
        numb_cols = int(math.floor(self._img_width / self.piece_width))
        numb_rows = int(math.floor(self._img_height / self.piece_width))
        if numb_cols == 0 or numb_rows == 0:
            raise ValueError("Image size is too small for the image.  Check your setup")

        self._grid_size = (numb_rows, numb_cols)
        original_width = self._img_width
        original_height = self._img_height
        self._img_width = numb_cols * self.piece_width
        self._img_height = numb_rows * self.piece_width

        upper_left = ((original_height - self._img_height) // 2,
                      (original_width - self._img_width) // 2)
        self._img = Puzzle.extract_subimage(self._img, upper_left,
                                            (self._img_height, self._img_width))
        self._img_LAB = Puzzle.extract_subimage(self._img_LAB, upper_left,
                                                (self._img_height, self._img_width))

        piece_id = starting_id_numb
        piece_size = (self.piece_width, self.piece_width)
        self._pieces = []
        for row in range(numb_rows):
            for col in range(numb_cols):
                piece_upper_left = (row * piece_size[0], col * piece_size[1])
                piece_img = Puzzle.extract_subimage(self._img_LAB, piece_upper_left, piece_size)
                erosion_size = math.ceil(self.piece_width * (1 - self._erosion))
                piece_img_erosion = Puzzle.centre_crop(piece_img, (erosion_size, erosion_size))
                self._pieces.append(PuzzlePiece(self._id, (row, col), piece_img_erosion,
                                                piece_id=piece_id,
                                                puzzle_grid_size=self._grid_size))
                piece_id += 1

    # ------------------------------------------------------------- accessors
    @property
    def id_number(self):
        return self._id

    @property
    def pieces(self):
        return self._pieces

    @property
    def piece_width(self):
        return self._piece_width

    @property
    def grid_size(self):
        return self._grid_size

    # ------------------------------------------------------------ reconstruct
    def build_placed_piece_info(self):
        """[grid] matrices of original piece id and rotation per placed
        location; -1 where empty (puzzle_importer.py:158-180)."""
        placed_piece_matrix = np.full(self._grid_size, -1, np.int32)
        placed_piece_rotation = np.full(self._grid_size, -1, np.int32)
        for piece in self._pieces:
            placed_piece_matrix[piece.location] = piece.original_piece_id
            placed_piece_rotation[piece.location] = piece.rotation.value
        return placed_piece_matrix, placed_piece_rotation

    @staticmethod
    def reconstruct_from_pieces(pieces, piece_width, id_numb=-1, display_image=False):
        """puzzle_importer.py:264-321."""
        import cv2

        if len(pieces) == 0:
            raise ValueError("Error: Each puzzle must have at least one piece.")

        output_puzzle = Puzzle(id_numb)
        output_puzzle._id = id_numb
        output_puzzle._pieces = copy.deepcopy(pieces)
        output_puzzle._piece_width = piece_width

        (min_row, max_row, min_col, max_col) = output_puzzle.get_min_and_max_row_and_columns()
        for piece in output_puzzle._pieces:
            loc = piece.location
            piece.location = (loc[0] - min_row, loc[1] - min_col)

        output_puzzle._grid_size = (max_row - min_row + 1, max_col - min_col + 1)
        output_puzzle._img_width = output_puzzle._grid_size[1] * output_puzzle.piece_width
        output_puzzle._img_height = output_puzzle._grid_size[0] * output_puzzle.piece_width

        size = (output_puzzle._img_height, output_puzzle._img_width)
        output_puzzle._img = Puzzle.create_solid_bgr_image(size, ImageColor.black)
        for piece in output_puzzle._pieces:
            pad_size = (piece_width - piece.width) // 2
            output_puzzle.insert_piece_into_image(piece, pad_size)

        output_puzzle._img_LAB = cv2.cvtColor(output_puzzle._img, cv2.COLOR_BGR2LAB)
        return output_puzzle

    def randomize_puzzle_piece_locations(self):
        all_locations = [p.location for p in self._pieces]
        random.shuffle(all_locations)
        for i, piece in enumerate(self._pieces):
            piece.location = all_locations[i]

    def randomize_puzzle_piece_rotations(self):
        for piece in self._pieces:
            piece.rotation = PuzzlePieceRotation.random_rotation()

    def get_min_and_max_row_and_columns(self):
        locs = np.asarray([p.location for p in self._pieces])
        return (int(locs[:, 0].min()), int(locs[:, 0].max()),
                int(locs[:, 1].min()), int(locs[:, 1].max()))

    @staticmethod
    def create_solid_bgr_image(size, color):
        return np.zeros((size[0], size[1], Puzzle.NUMBER_BGR_DIMENSIONS), np.uint8)

    @staticmethod
    def extract_subimage(img, upper_left, size):
        return img[upper_left[0]:upper_left[0] + size[0],
                   upper_left[1]:upper_left[1] + size[1], :]

    @staticmethod
    def centre_crop(img, dim):
        width, height = img.shape[1], img.shape[0]
        crop_width = dim[0] if dim[0] < img.shape[1] else img.shape[1]
        crop_height = dim[1] if dim[1] < img.shape[0] else img.shape[0]
        crop_top = int(round((height - crop_height) / 2.0))
        crop_left = int(round((width - crop_width) / 2.0))
        return img[crop_top:crop_top + crop_height, crop_left:crop_left + crop_width, :]

    def insert_piece_into_image(self, piece: PuzzlePiece, pad_size=0):
        """Paste a piece; wrongly-placed pieces get a red border marker
        (puzzle_importer.py:448-473)."""
        import cv2

        piece_loc = piece.location
        upper_left = (piece_loc[0] * self._piece_width, piece_loc[1] * self._piece_width)
        piece_bgr = piece.bgr_image()
        if not piece.is_correctly_placed((0, 0)):
            piece_bgr = cv2.copyMakeBorder(piece_bgr, 1, 1, 1, 1, cv2.BORDER_CONSTANT,
                                           value=[0, 0, 255])
            p = max(pad_size - 1, 0)
            piece_bgr = cv2.copyMakeBorder(piece_bgr, p, p, p, p, cv2.BORDER_CONSTANT)
            if piece_bgr.shape[0] > self._piece_width:
                # zero-erosion pieces: the red marker border would overflow
                # the cell; crop back to the cell size
                piece_bgr = Puzzle.centre_crop(piece_bgr,
                                               (self._piece_width, self._piece_width))
        else:
            p = pad_size
            piece_bgr = cv2.copyMakeBorder(piece_bgr, p, p, p, p, cv2.BORDER_CONSTANT)
        if piece.rotation is None or piece.rotation == PuzzlePieceRotation.degree_0:
            Puzzle.insert_subimage(self._img, upper_left, piece_bgr)
        else:
            rotated_img = np.rot90(piece_bgr, piece.rotation.value // 90)
            Puzzle.insert_subimage(self._img, upper_left, rotated_img)

    @staticmethod
    def insert_subimage(master_img, upper_left, subimage):
        if upper_left[0] < 0 or upper_left[1] < 0:
            raise ValueError("Error: upper left is off the image grid. Row and column must be >=0")
        shape = subimage.shape
        bottom_right = [upper_left[0] + shape[0], upper_left[1] + shape[1]]
        master_shape = master_img.shape
        assert master_shape[0] >= bottom_right[0] and master_shape[1] >= bottom_right[1]
        master_img[upper_left[0]:bottom_right[0], upper_left[1]:bottom_right[1], :] = subimage

    def save_to_file(self, filename):
        import cv2

        cv2.imwrite(filename, self._img)

    def build_direct_accuracy_image(self, direct_acc, filename=None):
        """Render the solved board with each piece framed in its
        direct-accuracy result color (green correct / red wrong location /
        orange wrong rotation / blue different puzzle — the color table at
        puzzle_importer.py:1151-1159 used by the reference's accuracy image
        output)."""
        import cv2

        size = (self._grid_size[0] * self._piece_width,
                self._grid_size[1] * self._piece_width)
        img = Puzzle.create_solid_bgr_image(size, ImageColor.black)
        for piece in self._pieces:
            result = direct_acc.get_piece_result(piece.id_number)
            color = np.asarray(result.value, np.uint8)
            piece_bgr = piece.bgr_image().copy()
            # paint the marker border inside the piece so zero-erosion
            # pieces keep it after fitting into the cell
            piece_bgr[:2] = color
            piece_bgr[-2:] = color
            piece_bgr[:, :2] = color
            piece_bgr[:, -2:] = color
            if piece_bgr.shape[0] < self._piece_width:
                p0 = (self._piece_width - piece_bgr.shape[0] + 1) // 2
                p1 = (self._piece_width - piece_bgr.shape[1] + 1) // 2
                piece_bgr = cv2.copyMakeBorder(
                    piece_bgr, p0, self._piece_width - piece_bgr.shape[0] - p0,
                    p1, self._piece_width - piece_bgr.shape[1] - p1,
                    cv2.BORDER_CONSTANT)
            if piece.rotation is not None and piece.rotation != PuzzlePieceRotation.degree_0:
                piece_bgr = np.rot90(piece_bgr, piece.rotation.value // 90)
            upper_left = (piece.location[0] * self._piece_width,
                          piece.location[1] * self._piece_width)
            Puzzle.insert_subimage(img, upper_left, piece_bgr)
        if filename is not None:
            cv2.imwrite(filename, img)
        return img

    # ------------------------------------------------------------ accuracies
    def determine_standard_direct_accuracy(self, expected_puzzle_id,
                                           numb_pieces_in_original_puzzle):
        return self.determine_modified_direct_accuracy(expected_puzzle_id, (0, 0),
                                                       numb_pieces_in_original_puzzle)

    def determine_modified_direct_accuracy(self, expected_puzzle_id, upper_left,
                                           numb_pieces_in_original_puzzle):
        """puzzle_importer.py:558-598."""
        accuracy_info = DirectAccuracyPuzzleResults(expected_puzzle_id, self.id_number,
                                                    numb_pieces_in_original_puzzle)
        for piece in self._pieces:
            if piece.original_puzzle_id != expected_puzzle_id:
                accuracy_info.add_different_puzzle(piece)
            elif not piece.is_correctly_placed(upper_left):
                accuracy_info.add_wrong_location(piece)
            elif piece.rotation != PuzzlePieceRotation.degree_0:
                accuracy_info.add_wrong_rotation(piece)
            else:
                accuracy_info.add_correct_placement(piece)
        return accuracy_info


class DirectAccuracyPuzzleResults:
    """puzzle_importer.py:1162-1383."""

    def __init__(self, original_puzzle_id, solved_puzzle_id, numb_pieces_in_original_puzzle):
        self._orig_puzzle_id = original_puzzle_id
        self._solved_puzzle_id = solved_puzzle_id
        self._different_puzzle = {}
        self.numb_pieces_in_original_puzzle = numb_pieces_in_original_puzzle
        self._wrong_location = {}
        self._wrong_rotation = {}
        self._correct_placement = {}

    def get_piece_result(self, piece_id):
        key = str(piece_id)
        if key in self._correct_placement:
            return PieceDirectAccuracyResult.correct_placement
        if key in self._wrong_rotation:
            return PieceDirectAccuracyResult.wrong_rotation
        if key in self._wrong_location:
            return PieceDirectAccuracyResult.wrong_location
        if key in self._different_puzzle:
            return PieceDirectAccuracyResult.different_puzzle
        raise ValueError(f'Piece id: "{piece_id}" does not exist in this result set.')

    @property
    def original_puzzle_id(self):
        return self._orig_puzzle_id

    @property
    def solved_puzzle_id(self):
        return self._solved_puzzle_id

    def add_wrong_location(self, piece):
        self._wrong_location[str(piece.id_number)] = piece

    def add_different_puzzle(self, piece):
        self._different_puzzle[str(piece.id_number)] = piece

    def add_wrong_rotation(self, piece):
        self._wrong_rotation[str(piece.id_number)] = piece

    def add_correct_placement(self, piece):
        self._correct_placement[str(piece.id_number)] = piece

    @property
    def weighted_accuracy(self):
        return 1.0 * self.numb_correct_placements / (self.numb_pieces_in_original_puzzle
                                                     + self.numb_different_puzzle)

    @property
    def numb_correct_placements(self):
        return len(self._correct_placement)

    @property
    def numb_wrong_location(self):
        return len(self._wrong_location)

    @property
    def numb_wrong_rotation(self):
        return len(self._wrong_rotation)

    @property
    def numb_different_puzzle(self):
        return len(self._different_puzzle)

    @property
    def total_numb_pieces_in_solved_puzzle(self):
        return self.numb_pieces_from_original_puzzle_in_solved_puzzle + self.numb_different_puzzle

    @property
    def numb_pieces_from_original_puzzle_in_solved_puzzle(self):
        return self.numb_correct_placements + self.numb_wrong_location + self.numb_wrong_rotation

    @staticmethod
    def check_if_update_direct_accuracy(current_best, new):
        if current_best is None:
            return True
        best_included = current_best.numb_pieces_from_original_puzzle_in_solved_puzzle
        best_accuracy = current_best.weighted_accuracy
        new_included = new.numb_pieces_from_original_puzzle_in_solved_puzzle
        new_accuracy = new.weighted_accuracy
        return (best_accuracy < new_accuracy
                or (best_accuracy == new_accuracy and best_included < new_included))


class ModifiedNeighborAccuracy:
    """puzzle_importer.py:1386-1627."""

    def __init__(self, original_puzzle_id, solved_puzzle_id, number_of_pieces):
        self._original_puzzle_id = original_puzzle_id
        self._solved_puzzle_id = solved_puzzle_id
        self._actual_number_of_pieces = number_of_pieces
        self._wrong_puzzle_id = {}
        self._correct_neighbors = {}
        self._wrong_neighbors = {}

    @staticmethod
    def _key(piece_id, side):
        return f"{piece_id}_{side.value}"

    def get_piece_side_result(self, piece_id, side):
        if self._key(piece_id, side) in self._wrong_puzzle_id:
            return PieceSideNeighborAccuracyResult.different_puzzle_id
        if self._key(piece_id, side) in self._correct_neighbors:
            return PieceSideNeighborAccuracyResult.correct_neighbor
        if self._key(piece_id, side) in self._wrong_neighbors:
            return PieceSideNeighborAccuracyResult.wrong_neighbor
        raise ValueError(f'Pairing of piece id "{piece_id}" and side "{side.side_name}" '
                         f"does not exist in this puzzle")

    def add_wrong_puzzle_id(self, piece_id, side):
        self._wrong_puzzle_id[self._key(piece_id, side)] = (piece_id, side)

    def add_correct_neighbor(self, piece_id, side):
        self._correct_neighbors[self._key(piece_id, side)] = (piece_id, side)

    def add_wrong_neighbor(self, piece_id, side):
        self._wrong_neighbors[self._key(piece_id, side)] = (piece_id, side)

    @property
    def wrong_puzzle_id(self):
        return len(self._wrong_puzzle_id)

    @property
    def correct_neighbor_count(self):
        return len(self._correct_neighbors)

    @property
    def wrong_neighbor_count(self):
        return len(self._wrong_neighbors)

    @property
    def original_puzzle_id(self):
        return self._original_puzzle_id

    @property
    def solved_puzzle_id(self):
        return self._solved_puzzle_id

    @property
    def total_numb_pieces_in_solved_puzzle(self):
        return self.numb_pieces_from_original_puzzle_in_solved_puzzle + self.wrong_puzzle_id

    @property
    def numb_pieces_in_original_puzzle(self):
        return self._actual_number_of_pieces

    @property
    def numb_pieces_from_original_puzzle_in_solved_puzzle(self):
        return (self.correct_neighbor_count
                + self.wrong_neighbor_count) / PuzzlePieceSide.get_numb_sides()

    @property
    def weighted_accuracy(self):
        accuracy = 1.0 * self.correct_neighbor_count / (self._actual_number_of_pieces
                                                        + self.wrong_puzzle_id)
        return accuracy / PuzzlePieceSide.get_numb_sides()

    @staticmethod
    def check_if_update_neighbor_accuracy(current_best, new):
        if current_best is None:
            return True
        best_correct = current_best.correct_neighbor_count
        best_accuracy = current_best.weighted_accuracy
        new_correct = new.correct_neighbor_count
        new_accuracy = new.weighted_accuracy
        return (best_accuracy < new_accuracy
                or (best_accuracy == new_accuracy and best_correct < new_correct))


class BestBuddyAccuracy:
    """Best-buddy accuracy for one solved puzzle (puzzle_importer.py:1630+).

    Each (piece, side) best-buddy relation is classified: CORRECT when the
    best buddy is the piece's actual original neighbor on that side, WRONG
    otherwise, OPEN when the partner was never placed into this puzzle, and
    EXCLUDED for pieces outside the scored region.
    """

    _PERFORM_ASSERT_CHECK = True

    def __init__(self, puzzle_id):
        self.puzzle_id = puzzle_id
        self._open_best_buddies = {}
        self._wrong_best_buddies = {}
        self._correct_best_buddies = {}
        self._excluded_best_buddies = {}

    @staticmethod
    def piece_side_tuple_key(piece_id, side):
        return f"{piece_id}_{side.value}"

    @staticmethod
    def add_piece_side_tuple_to_dict(d, piece_id, side):
        d[BestBuddyAccuracy.piece_side_tuple_key(piece_id, side)] = (piece_id, side)

    @staticmethod
    def check_if_piece_side_tuple_in_dict(d, piece_id, side):
        return BestBuddyAccuracy.piece_side_tuple_key(piece_id, side) in d

    def add_excluded_best_buddy(self, piece_id, side):
        self.add_piece_side_tuple_to_dict(self._excluded_best_buddies, piece_id, side)

    def add_open_best_buddy(self, piece_id, side):
        self.add_piece_side_tuple_to_dict(self._open_best_buddies, piece_id, side)

    def delete_open_best_buddy(self, piece_id, side):
        if self.exists_open_best_buddy(piece_id, side):
            del self._open_best_buddies[self.piece_side_tuple_key(piece_id, side)]

    def exists_open_best_buddy(self, piece_id, side):
        return self.check_if_piece_side_tuple_in_dict(self._open_best_buddies,
                                                      piece_id, side)

    def exists_wrong_best_buddy(self, piece_id, side):
        return self.check_if_piece_side_tuple_in_dict(self._wrong_best_buddies,
                                                      piece_id, side)

    def exists_correct_best_buddy(self, piece_id, side):
        return self.check_if_piece_side_tuple_in_dict(self._correct_best_buddies,
                                                      piece_id, side)

    def add_wrong_best_buddy(self, piece_id, side):
        self.add_piece_side_tuple_to_dict(self._wrong_best_buddies, piece_id, side)

    def add_correct_best_buddy(self, piece_id, side):
        self.add_piece_side_tuple_to_dict(self._correct_best_buddies, piece_id, side)

    def get_piece_side_result(self, piece_id, side):
        if self.exists_wrong_best_buddy(piece_id, side):
            return PieceSideBestBuddyAccuracyResult.wrong_best_buddy
        if self.exists_correct_best_buddy(piece_id, side):
            return PieceSideBestBuddyAccuracyResult.correct_best_buddy
        if self.exists_open_best_buddy(piece_id, side):
            return PieceSideBestBuddyAccuracyResult.open_best_buddy
        return PieceSideBestBuddyAccuracyResult.no_best_buddy

    @property
    def numb_open_best_buddies(self):
        return len(self._open_best_buddies)

    @property
    def numb_wrong_best_buddies(self):
        return len(self._wrong_best_buddies)

    @property
    def numb_correct_best_buddies(self):
        return len(self._correct_best_buddies)

    @property
    def total_best_buddies(self):
        return (self.numb_open_best_buddies + self.numb_wrong_best_buddies
                + self.numb_correct_best_buddies)

    @property
    def accuracy(self):
        total = self.total_best_buddies
        return self.numb_correct_best_buddies / total if total else 0.0


class PuzzleResultsInformation:
    """Accuracy results for one original puzzle (puzzle_importer.py:846-1148)."""

    def __init__(self, puzzle_id, original_img_filename):
        self.original_id_number = puzzle_id
        self._numb_pieces = 0
        self._original_img_filename = original_img_filename
        self.standard_direct_accuracy = None
        self.modified_direct_accuracy = None
        self.modified_neighbor_accuracy = None
        self.best_buddy_accuracy = None

    def resolve_best_buddy_accuracy(self, solved_puzzle: Puzzle, best_buddy_pairs):
        """Classify engine best-buddy relations against ground truth.

        ``best_buddy_pairs``: iterable of (piece_id, side, buddy_id,
        buddy_side) in UNROTATED piece frames (the space the compatibility
        engine works in; see CompatibilityEngine.find_best_buddies).
        """
        info = BestBuddyAccuracy(solved_puzzle.id_number)
        by_id = {p.id_number: p for p in solved_puzzle.pieces}
        for piece_id, side, buddy_id, buddy_side in best_buddy_pairs:
            piece = by_id.get(piece_id)
            buddy = by_id.get(buddy_id)
            if piece is None or piece.original_puzzle_id != self.original_id_number:
                if piece is not None:
                    info.add_excluded_best_buddy(piece_id, side)
                continue
            if buddy is None:
                info.add_open_best_buddy(piece_id, side)
                continue
            expected = piece.original_neighbor_id_numbers_and_sides[side.value]
            correct = (expected[0] == buddy.original_piece_id
                       and buddy_side == side.complementary_side)
            if correct:
                info.add_correct_best_buddy(piece_id, side)
            else:
                info.add_wrong_best_buddy(piece_id, side)
        self.best_buddy_accuracy = info

    @property
    def numb_pieces(self):
        return self._numb_pieces

    @numb_pieces.setter
    def numb_pieces(self, value):
        self._numb_pieces = value

    @property
    def original_filename(self):
        return self._original_img_filename

    def resolve_neighbor_accuracies(self, solved_puzzle: Puzzle):
        """puzzle_importer.py:985-1058."""
        placed_piece_matrix, rotation_matrix = solved_puzzle.build_placed_piece_info()
        info = ModifiedNeighborAccuracy(self.original_id_number, solved_puzzle.id_number,
                                        self.numb_pieces)

        for piece in solved_puzzle.pieces:
            original = piece.original_neighbor_id_numbers_and_sides
            neighbor_location_and_sides = sorted(piece.get_neighbor_locations_and_sides(),
                                                 key=lambda tup: tup[1].value)
            assert len(neighbor_location_and_sides) == len(original)
            for i in range(len(neighbor_location_and_sides)):
                assert neighbor_location_and_sides[i][1] == original[i][1]

            for side_numb in range(len(neighbor_location_and_sides)):
                side = PuzzlePieceSide(side_numb)
                if piece.original_puzzle_id != self.original_id_number:
                    info.add_wrong_puzzle_id(piece.id_number, side)
                    continue

                neighbor_loc = neighbor_location_and_sides[side_numb][0]
                if (neighbor_loc[0] < 0 or neighbor_loc[1] < 0
                        or neighbor_loc[0] >= solved_puzzle.grid_size[0]
                        or neighbor_loc[1] >= solved_puzzle.grid_size[1]):
                    placed_piece_id = None
                else:
                    placed_piece_id = int(placed_piece_matrix[neighbor_loc])
                    placed_piece_id = placed_piece_id if placed_piece_id >= 0 else None

                if (placed_piece_id == original[side_numb][0]
                        and (original[side_numb][0] is None
                             or piece.rotation.value == rotation_matrix[
                                 neighbor_location_and_sides[side_numb][0]])):
                    info.add_correct_neighbor(piece.id_number, side)
                else:
                    info.add_wrong_neighbor(piece.id_number, side)

        if ModifiedNeighborAccuracy.check_if_update_neighbor_accuracy(
                self.modified_neighbor_accuracy, info):
            self.modified_neighbor_accuracy = info

    def resolve_direct_accuracies(self, puzzle: Puzzle):
        """puzzle_importer.py:1060-1137."""
        new_direct = puzzle.determine_standard_direct_accuracy(self.original_id_number,
                                                               self.numb_pieces)
        if DirectAccuracyPuzzleResults.check_if_update_direct_accuracy(
                self.standard_direct_accuracy, new_direct):
            self.standard_direct_accuracy = new_direct
        self._resolve_modified_direct_accuracy(puzzle)

    def _resolve_modified_direct_accuracy(self, puzzle: Puzzle):
        """BFS over candidate upper-left origins at minimum Manhattan
        distance (puzzle_importer.py:1081-1137)."""
        placed_piece_matrix, _ = puzzle.build_placed_piece_info()
        frontier_set = [(0, 0)]
        explored_set = []
        found_dist = None
        while found_dist is None or (frontier_set
                                     and frontier_set[0][0] + frontier_set[0][1] <= found_dist):
            next_loc = frontier_set.pop(0)
            explored_set.append(next_loc)
            if found_dist is None and placed_piece_matrix[next_loc] != -1:
                found_dist = next_loc[0] + next_loc[1]
            else:
                down_loc = (next_loc[0] + 1, next_loc[1])
                if (down_loc[0] < puzzle.grid_size[0] and down_loc not in explored_set
                        and down_loc not in frontier_set):
                    frontier_set.append(down_loc)
                right_loc = (next_loc[0], next_loc[1] + 1)
                if (right_loc[1] < puzzle.grid_size[1] and right_loc not in explored_set
                        and right_loc not in frontier_set):
                    frontier_set.append(right_loc)

        for possible_upper_left in explored_set:
            modified = puzzle.determine_modified_direct_accuracy(
                self.original_id_number, possible_upper_left, self.numb_pieces)
            if DirectAccuracyPuzzleResults.check_if_update_direct_accuracy(
                    self.modified_direct_accuracy, modified):
                self.modified_direct_accuracy = modified


class PuzzleResultsCollection:
    """puzzle_importer.py:731-843."""

    def __init__(self, puzzle_solver_type, puzzle_type, solved_puzzles, image_file_paths):
        self._puzzle_solver_type = puzzle_solver_type
        self._puzzle_type = puzzle_type
        self._image_filenames = image_file_paths
        self._numb_output_puzzles = len(solved_puzzles)
        self._puzzle_results: List[PuzzleResultsInformation] = []

        for set_of_pieces in solved_puzzles:
            for piece in set_of_pieces:
                puzzle_exists = False
                for result in self._puzzle_results:
                    if piece.original_puzzle_id == result.original_id_number:
                        puzzle_exists = True
                        result.numb_pieces += 1
                        continue
                if not puzzle_exists:
                    new_puzzle = PuzzleResultsInformation(
                        piece.original_puzzle_id,
                        image_file_paths[piece.original_puzzle_id])
                    new_puzzle.numb_pieces = 1
                    self._puzzle_results.append(new_puzzle)

        self._puzzle_results = sorted(self._puzzle_results,
                                      key=lambda r: r.original_id_number)

    def calculate_accuracies(self, solved_puzzles, best_buddy_pairs=None):
        """``best_buddy_pairs``: optional per-puzzle lists of (piece_id,
        side, buddy_id, buddy_side) tuples from the compatibility engine
        (or the ``best_buddy_pairs`` attribute the solver driver attaches
        to reconstructed puzzles); enables the best-buddy accuracy metric
        (puzzle_importer.py:1630+)."""
        if best_buddy_pairs is None:
            best_buddy_pairs = [getattr(p, "best_buddy_pairs", None)
                                for p in solved_puzzles]
        for puzzle_results, puzzle, pairs in zip(self._puzzle_results,
                                                 solved_puzzles, best_buddy_pairs):
            puzzle_results.resolve_direct_accuracies(puzzle)
            puzzle_results.resolve_neighbor_accuracies(puzzle)
            if pairs is not None:
                puzzle_results.resolve_best_buddy_accuracy(puzzle, pairs)

    @property
    def results(self):
        return self._puzzle_results

    def collect_results(self):
        """-> ({Direct_Standard, Direct_Modified, neighbor}: [per-puzzle
        fractions], perfect flags) (puzzle_importer.py:805-843)."""
        result = {"neighbor": []}
        perfect_puzzles = []
        for results in self._puzzle_results:
            for accuracy_type in [ResultAccuracyMetric.StandardDirectAccuracy,
                                  ResultAccuracyMetric.ModifiedDirectAccuracy]:
                if accuracy_type == ResultAccuracyMetric.StandardDirectAccuracy:
                    acc_name = "Direct_Standard"
                    direct_acc = results.standard_direct_accuracy
                else:
                    acc_name = "Direct_Modified"
                    direct_acc = results.modified_direct_accuracy
                if acc_name not in result:
                    result[acc_name] = []
                numb_pieces = results.numb_pieces
                piece_count_weight = direct_acc.numb_different_puzzle + numb_pieces
                result[acc_name].append(direct_acc.numb_correct_placements / piece_count_weight)
                if accuracy_type == ResultAccuracyMetric.StandardDirectAccuracy:
                    perfect_puzzles.append(
                        direct_acc.numb_correct_placements == piece_count_weight)

            neighbor_acc = results.modified_neighbor_accuracy
            weight = neighbor_acc.numb_pieces_in_original_puzzle + neighbor_acc.wrong_puzzle_id
            weight *= PuzzlePieceSide.get_numb_sides()
            result["neighbor"].append(neighbor_acc.correct_neighbor_count / weight)

            if results.best_buddy_accuracy is not None:
                result.setdefault("best_buddy", []).append(
                    results.best_buddy_accuracy.accuracy)
        return result, perfect_puzzles


class PuzzleTester:
    """Synthetic 9-piece puzzle whose pixel values increase sequentially so
    expected distances are computable in closed form
    (puzzle_importer.py:601-728). True-neighbor asymmetric distances are
    exactly 0 under the border-extrapolation distance."""

    PIECE_WIDTH = 5
    NUMB_PUZZLE_PIECES = 9
    GRID_SIZE = (3, 3)
    NUMB_PIXEL_DIMENSIONS = 3
    TEST_ARRAY_FIRST_PIXEL_VALUE = 0

    @staticmethod
    def build_pixel_list(start_value, is_row, reverse_list=False):
        if is_row:
            pixel_offset = PuzzleTester.NUMB_PIXEL_DIMENSIONS
        else:
            pixel_offset = PuzzleTester.row_to_row_step_size()
        pixels = np.zeros((PuzzleTester.PIECE_WIDTH, PuzzleTester.NUMB_PIXEL_DIMENSIONS))
        for i in range(PuzzleTester.PIECE_WIDTH):
            pixel_start = start_value + i * pixel_offset
            for j in range(PuzzleTester.NUMB_PIXEL_DIMENSIONS):
                pixels[i, j] = pixel_start + j
        return pixels[::-1] if reverse_list else pixels

    @staticmethod
    def row_to_row_step_size():
        return int(PuzzleTester.NUMB_PIXEL_DIMENSIONS * PuzzleTester.PIECE_WIDTH
                   * math.sqrt(PuzzleTester.NUMB_PUZZLE_PIECES))

    @staticmethod
    def piece_to_piece_step_size():
        return PuzzleTester.NUMB_PIXEL_DIMENSIONS * PuzzleTester.PIECE_WIDTH

    @staticmethod
    def build_dummy_puzzle():
        puzzle = Puzzle(0)
        piece_width = PuzzleTester.PIECE_WIDTH
        numb_pieces = PuzzleTester.NUMB_PUZZLE_PIECES
        numb_dim = PuzzleTester.NUMB_PIXEL_DIMENSIONS

        grid = int(math.sqrt(numb_pieces))
        dummy_img = np.zeros((piece_width * grid, piece_width * grid, numb_dim))
        val = PuzzleTester.TEST_ARRAY_FIRST_PIXEL_VALUE
        shape = dummy_img.shape
        for row in range(shape[0]):
            for col in range(shape[1]):
                for dim in range(shape[2]):
                    dummy_img[row, col, dim] = val
                    val += 1

        puzzle._img = dummy_img
        puzzle._img_LAB = dummy_img
        puzzle._img_width = shape[1]
        puzzle._img_height = shape[0]
        puzzle._piece_width = piece_width
        puzzle._grid_size = (grid, grid)
        puzzle.make_pieces()
        return puzzle
