"""Rung 2 of the ladder: pure Linear, NO FFT — if this overfits and the
spectral variant doesn't, the FFT path is the culprit.

(reference experiments/sanity_check_linear.py)
Run: python experiments/sanity_check_linear.py
"""

import math
from collections import Counter, defaultdict

import numpy as np

from _lab import LabModel, overfit, sentence_batch


def next_byte_entropy_floor(x, y) -> float:
    """A per-position (no-context) model cannot beat H(next | current):
    the conditional entropy of the next byte given only the current one."""
    pairs = defaultdict(Counter)
    for a, b in zip(np.asarray(x)[0].tolist(), np.asarray(y)[0].tolist()):
        pairs[a][b] += 1
    total = sum(sum(c.values()) for c in pairs.values())
    h = 0.0
    for counts in pairs.values():
        n = sum(counts.values())
        h += sum(-c * math.log(c / n) for c in counts.values()) / total
    return h


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    floor = next_byte_entropy_floor(x, y)
    print(f"pure-linear model (no FFT) — ambiguity floor H(next|current) = {floor:.4f}:")
    _, trace = overfit(LabModel(variant="linear"), x, y, steps=600)
    assert trace[-1] < floor + 0.25, (
        "the FFT-free model cannot even reach its ambiguity floor — "
        "the problem is NOT the FFT"
    )
    print(
        "linear sanity check PASSED: reaches the no-context floor (so only a "
        "context-mixing path — the FFT — can go below it)"
    )


if __name__ == "__main__":
    main()
