"""Checkpoint / resume for LVPP solves.

The reference has no restart capability (SURVEY.md §5 — warm starts only);
this is the strictly-better addition the rebuild plan calls for: an npz
snapshot of the solver state (x, x_k, alpha bookkeeping, iteration
counters, observables) that LVPPSolver/continuation drivers can resume
from mid-run."""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List

import numpy as np


@dataclass
class LVPPCheckpoint:
    x: np.ndarray
    x_k: np.ndarray
    iteration: int
    alpha_prev_raw: float
    alpha_scale: float = 1.0
    nfail: int = 0
    step: int = 0                      # continuation step (fracture loads)
    newton_steps: List[int] = field(default_factory=list)
    step_sizes: List[float] = field(default_factory=list)
    increments: List[float] = field(default_factory=list)
    observables: Dict[str, List[float]] = field(default_factory=dict)

    def save(self, path) -> Path:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        meta = {"iteration": self.iteration,
                "alpha_prev_raw": self.alpha_prev_raw,
                "alpha_scale": self.alpha_scale,
                "nfail": self.nfail, "step": self.step,
                "newton_steps": self.newton_steps,
                "step_sizes": self.step_sizes,
                "increments": self.increments,
                "observables": self.observables}
        np.savez(path, x=np.asarray(self.x), x_k=np.asarray(self.x_k),
                 meta=json.dumps(meta))
        return path

    @classmethod
    def load(cls, path) -> "LVPPCheckpoint":
        data = np.load(Path(path), allow_pickle=False)
        meta = json.loads(str(data["meta"]))
        return cls(x=data["x"], x_k=data["x_k"], **meta)
