"""Adapters from solver PuzzlePiece lists to NN input
(re-creates /root/reference/data/datasets/pieces_dataset.py)."""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np
from PIL import Image

from vit_ed_tpu.solver.piece import PuzzlePiece


def piece_to_rgb_image(piece: PuzzlePiece) -> Image.Image:
    """LAB -> RGB PIL conversion (pieces_dataset.py:35-38)."""
    import cv2

    img = piece.lab_image
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    return Image.fromarray(cv2.cvtColor(img, cv2.COLOR_LAB2RGB))


class PiecesDataset:
    """All ordered pairs (i, j), i != j, as stacked pair images
    (pieces_dataset.py:14-59)."""

    def __init__(self, pieces: List[PuzzlePiece], transform: Optional[Callable] = None):
        self.pieces = pieces
        self.transform = transform
        self.entries = [(i, j) for i in range(len(pieces))
                        for j in range(len(pieces)) if i != j]

    def __getitem__(self, index: int):
        i, j = self.entries[index]
        first_img = piece_to_rgb_image(self.pieces[i])
        second_img = piece_to_rgb_image(self.pieces[j])
        if self.transform is not None:
            first_img, second_img = self.transform(first_img, second_img)
        stacked = np.stack([np.asarray(first_img), np.asarray(second_img)], axis=0)
        return stacked.astype(np.float32), np.asarray(index, np.int32)

    def __len__(self):
        return len(self.entries)


class PiecesImages:
    """Single-piece images (for the encode-once dense scorer)."""

    def __init__(self, pieces: List[PuzzlePiece], transform: Optional[Callable] = None):
        self.pieces = pieces
        self.transform = transform

    def image(self, i: int) -> np.ndarray:
        img = piece_to_rgb_image(self.pieces[i])
        if self.transform is not None:
            img, _ = self.transform(img, img)
        return np.asarray(img, np.float32)

    def all_images(self) -> np.ndarray:
        return np.stack([self.image(i) for i in range(len(self.pieces))])

    def __len__(self):
        return len(self.pieces)


class PiecesDatasetTriplet:
    """4 rotated pairings per ordered pair for the ViT-triplet baseline
    (pieces_dataset.py:62-121)."""

    def __init__(self, pieces: List[PuzzlePiece], transform: Optional[Callable] = None):
        self.pieces = pieces
        self.transform = transform
        self.entries = [(i, j) for i in range(len(pieces))
                        for j in range(len(pieces)) if i != j]

    def __getitem__(self, index: int):
        i, j = self.entries[index]
        first_img = piece_to_rgb_image(self.pieces[i])
        second_img = piece_to_rgb_image(self.pieces[j])

        images = []
        for f, s in [
            (first_img, second_img.rotate(180)),       # right of first
            (first_img.rotate(90), second_img.rotate(270)),  # bottom
            (first_img.rotate(180), second_img),       # left
            (first_img.rotate(270), second_img.rotate(90)),  # top
        ]:
            ft, st = self.transform(f, s)
            images.append(np.stack([np.asarray(ft), np.asarray(st)], axis=0))
        return np.concatenate(images, axis=0).astype(np.float32), np.asarray(index, np.int32)

    def __len__(self):
        return len(self.entries)
