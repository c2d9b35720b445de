"""Ragged concentration-sequence CSV (the V1.2 capture format).

Reference: PPOV1.2 appends one ragged row per episode to ``data.csv`` — the
per-step normalized concentrations followed by the episode's source
concentration as the last column (PPOV1.2/ppo注释版.py:115-124, 431-434); the
V1.2 LSTM prototype then reads it with "all columns but last = sequence,
last = label" semantics (PPOV1.2/new.LSTM.py:18-24).
"""

from __future__ import annotations

import csv

import numpy as np


def save_conc_rows(path: str, sequences, source_concs, append: bool = False):
    """Write ragged rows: seq values..., source_conc."""
    mode = "a" if append else "w"
    with open(path, mode, newline="") as fh:
        w = csv.writer(fh)
        for seq, src in zip(sequences, source_concs):
            w.writerow([f"{float(v):.6g}" for v in seq] + [f"{float(src):.6g}"])


def load_conc_rows(path: str):
    """Returns (sequences: list[np.ndarray], source_concs: np.ndarray)."""
    sequences, sources = [], []
    with open(path, newline="") as fh:
        for row in csv.reader(fh):
            if not row:
                continue
            vals = np.asarray([float(v) for v in row], np.float32)
            sequences.append(vals[:-1])
            sources.append(vals[-1])
    return sequences, np.asarray(sources, np.float32)
