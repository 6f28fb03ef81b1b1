"""Phase timing instrumentation.

The analog of the reference's -DTIMING per-phase vectors
(vertex_program.hpp:202-208) printed as sum/mean/std (:2134-2152). Since
the production loop fuses all phases into one XLA program, fine-grained
phase times come from running the phases as separate jitted calls with
``block_until_ready`` fencing (use only for profiling, not production).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List

import numpy as np


class PhaseTimer:
    def __init__(self):
        self.samples: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, xs in self.samples.items():
            a = np.asarray(xs)
            lines.append(
                f"{name}: sum={a.sum()*1e3:.3f}ms "
                f"mean={a.mean()*1e3:.3f}ms std={a.std()*1e3:.3f}ms "
                f"n={a.size}")
        return "\n".join(lines)
