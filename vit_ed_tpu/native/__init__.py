"""Native (C++) runtime components.

Builds ``paikin_tal.cc`` into a shared library on first use (g++ -O3) and
exposes it via ctypes. Falls back gracefully when no compiler is available
— callers must check ``is_available()``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "paikin_tal.cc")
_LIB_PATH = os.path.join(_HERE, "libpaikin_tal.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build_and_load(src: str, lib_path: str, extra_flags=()):
    """Build ``src`` into ``lib_path`` (if stale) and ctypes-load it.

    Shared by every native binding. Never raises: returns None when the
    compiler is missing, the build fails, or the cached .so is corrupt
    (in which case it is rebuilt once before giving up). The compile
    writes to a temp file and ``os.replace``s it so concurrent processes
    never observe a half-written library.
    """

    def _compile() -> bool:
        tmp = f"{lib_path}.{os.getpid()}.tmp"
        # library flags must FOLLOW the source, or the linker records no
        # DT_NEEDED for them and dlopen fails with unresolved symbols
        libs = [f for f in extra_flags if f.startswith("-l")]
        flags = [f for f in extra_flags if not f.startswith("-l")]
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", *flags, src, "-o", tmp, *libs],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, lib_path)
            return True
        except Exception:
            try:
                os.remove(tmp)
            except OSError:
                pass
            return False

    try:
        fresh = (os.path.exists(lib_path)
                 and os.path.getmtime(lib_path) >= os.path.getmtime(src))
    except OSError:
        fresh = os.path.exists(lib_path)  # prebuilt install without sources
    if not fresh and not _compile():
        return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        # corrupt cached artifact (e.g. an interrupted historical build):
        # rebuild once, then give up gracefully
        if _compile():
            try:
                return ctypes.CDLL(lib_path)
            except OSError:
                return None
        return None


def _load():
    global _lib, _build_failed
    if _lib is not None:   # lock-free fast path (GIL-safe read)
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib = build_and_load(_SRC, _LIB_PATH)
        if lib is None:
            _build_failed = True
            return None
        lib.pt_solve.restype = ctypes.c_int
        lib.pt_solve.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        lib.pt_solve2.restype = ctypes.c_int
        lib.pt_solve2.argtypes = [
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ]
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def pt_solve(distances: np.ndarray, fixed_puzzle_dimensions=None,
             numb_puzzles: int = 1, new_board_mutual_compatibility: float = 0.5
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the native Paikin-Tal placement.

    Args:
        distances: [4, N, N] float array (type-1 side pairing).
    Returns:
        (rows, cols, puzzle_ids, bb) — int32 arrays of length N (locations
        normalized per output puzzle) and the initial best buddies
        bb[s*n+i] = buddy id or -1 (int64, length 4N).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native solver unavailable (no compiler?)")
    D = np.ascontiguousarray(distances, np.float64)
    assert D.ndim == 3 and D.shape[0] == 4 and D.shape[1] == D.shape[2]
    n = D.shape[1]
    rows = np.empty(n, np.int32)
    cols = np.empty(n, np.int32)
    pids = np.empty(n, np.int32)
    bb = np.empty(4 * n, np.int64)
    fr, fc = (0, 0)
    if fixed_puzzle_dimensions is not None:
        fr, fc = int(fixed_puzzle_dimensions[0]), int(fixed_puzzle_dimensions[1])
    rc = lib.pt_solve(n, D.reshape(-1), fr, fc, int(numb_puzzles),
                      float(new_board_mutual_compatibility), rows, cols, pids,
                      bb)
    if rc != 0:
        raise RuntimeError(f"native solver failed with code {rc}")
    return rows, cols, pids, bb


def pt_solve2(distances: np.ndarray, fixed_puzzle_dimensions=None,
              numb_puzzles: int = 1, new_board_mutual_compatibility: float = 0.5
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Run the native TYPE-2 (rotation-aware) Paikin-Tal placement.

    Args:
        distances: [4, N, 4, N] float array (all 16 side pairings).
    Returns:
        (rows, cols, puzzle_ids, rotations, bb): int32 arrays; rotations in
        quarter turns (0..3), locations normalized per output puzzle; bb is
        the initial best-buddy table, bb[s*n+i] = flat t*n+j or -1 (int64).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native solver unavailable (no compiler?)")
    D = np.ascontiguousarray(distances, np.float64)
    assert D.ndim == 4 and D.shape[0] == 4 and D.shape[2] == 4 \
        and D.shape[1] == D.shape[3]
    n = D.shape[1]
    rows = np.empty(n, np.int32)
    cols = np.empty(n, np.int32)
    pids = np.empty(n, np.int32)
    rots = np.empty(n, np.int32)
    bb = np.empty(4 * n, np.int64)
    fr, fc = (0, 0)
    if fixed_puzzle_dimensions is not None:
        fr, fc = int(fixed_puzzle_dimensions[0]), int(fixed_puzzle_dimensions[1])
    rc = lib.pt_solve2(n, D.reshape(-1), fr, fc, int(numb_puzzles),
                       float(new_board_mutual_compatibility), rows, cols,
                       pids, rots, bb)
    if rc != 0:
        raise RuntimeError(f"native type-2 solver failed with code {rc}")
    return rows, cols, pids, rots, bb
