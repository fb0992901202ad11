"""CSV golden-file helpers (reference util/test.rs read_csv_2d —
the golden-file comparison methodology of audio.rs:261-301)."""

from __future__ import annotations

import numpy as np


def read_csv_2d(path) -> np.ndarray:
    """[rows, cols] float array from a comma-separated file."""
    return np.loadtxt(path, delimiter=",", dtype=np.float64, ndmin=2)


def write_csv_2d(path, array: np.ndarray) -> None:
    np.savetxt(path, np.asarray(array), delimiter=",")
