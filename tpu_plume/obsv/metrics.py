"""Observability: per-episode CSV stats, throughput meters, scalar logging.

The reference logs through four channels (SURVEY.md §5): TensorBoard scalars
and histograms (PPOV1.1/train_ppo1.0.py:155-162), a per-episode CSV with the
reward decomposed into components (PPOV2.0/train_ppo2.0.py:128-135, 230-242),
live matplotlib dashboards, and stdout progress lines.  Here the CSV schema
is preserved column-for-column, scalars go to CSV + optional TensorBoard, and
— new, required by the throughput north star — rollout/update phases are
timed to report env-steps/sec and updates/sec.
"""

from __future__ import annotations

import csv
import os
import time
from typing import IO

# Reference column order (PPOV2.0/train_ppo2.0.py:129-135).
EPISODE_COLUMNS = [
    "Episode",
    "Total_Reward",
    "Success",
    "Conc_Reward",
    "Explore_Reward",
    "Move_Penalty",
    "TKE_Penalty",
    "Boundary_Penalty",
    "Steps",
    "Final_Conc",
    "Current_Radius",
]


class EpisodeCSVLogger:
    """Streams completed-episode rows in the reference's training_results
    CSV schema."""

    def __init__(self, path: str, append: bool = False):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        resume = append and os.path.exists(path) and os.path.getsize(path) > 0
        self.count = 0
        if resume:
            # Continue the Episode numbering from the existing rows
            # (mid-run resume, SURVEY.md §5).
            with open(path, newline="") as fh:
                self.count = max(sum(1 for _ in fh) - 1, 0)
        self._fh: IO = open(path, "a" if resume else "w", newline="")
        self._writer = csv.writer(self._fh)
        if not resume:
            self._writer.writerow(EPISODE_COLUMNS)

    def log_records(self, records: dict) -> int:
        """Drain a batch of masked EpisodeRecord arrays (host numpy) —
        rows where ``done`` is True are appended in scan order."""
        import numpy as np

        done = np.asarray(records["done"]).reshape(-1)
        if not done.any():
            return 0
        idx = np.nonzero(done)[0]
        cols = {
            k: np.asarray(v).reshape(-1)[idx]
            for k, v in records.items()
            if k != "done"
        }
        for i in range(len(idx)):
            self.count += 1
            self._writer.writerow(
                [
                    self.count,
                    float(cols["total_reward"][i]),
                    int(cols["success"][i]),
                    float(cols["conc_reward"][i]),
                    float(cols["explore_reward"][i]),
                    float(cols["move_penalty"][i]),
                    float(cols["tke_penalty"][i]),
                    float(cols["boundary_penalty"][i]),
                    int(cols["steps"][i]),
                    float(cols["final_conc"][i]),
                    float(cols["radius"][i]),
                ]
            )
        return len(idx)

    def close(self):
        self._fh.close()


class Stopwatch:
    """Phase timer for steps/sec accounting (jax work must be blocked on by
    the caller before stop())."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self._start: dict[str, float] = {}

    def start(self, phase: str):
        self._start[phase] = time.perf_counter()

    def stop(self, phase: str) -> float:
        dt = time.perf_counter() - self._start.pop(phase)
        self.totals[phase] = self.totals.get(phase, 0.0) + dt
        return dt


class TrainLogger:
    """Iteration-level scalar log: CSV always, TensorBoard when available."""

    def __init__(self, out_dir: str, use_tensorboard: bool = False,
                 append: bool = False):
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "train_log.csv")
        resume = append and os.path.exists(path) and os.path.getsize(path) > 0
        self._fh = open(path, "a" if resume else "w", newline="")
        self._skip_header = resume
        self._csv = csv.writer(self._fh)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
            except Exception:
                self._tb = None
        self._keys: list[str] | None = None

    def log_histograms(self, step: int, tree, prefix: str = "params"):
        """Per-leaf histograms (reference: per-parameter/gradient histograms
        each episode, PPOV1.1/train_ppo1.0.py:159-162). TensorBoard only."""
        if self._tb is None:
            return
        import jax

        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(
                getattr(k, "key", getattr(k, "name", str(k))) for k in path
            )
            import numpy as np

            self._tb.add_histogram(f"{prefix}/{name}", np.asarray(leaf), step)

    def log(self, step: int, scalars: dict):
        if self._keys is None:
            self._keys = sorted(scalars)
            if not self._skip_header:
                self._csv.writerow(["step"] + self._keys)
        self._csv.writerow([step] + [f"{float(scalars.get(k, float('nan'))):.6g}" for k in self._keys])
        self._fh.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
