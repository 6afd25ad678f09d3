"""Rung 1: the absolute simplest model — no residual, no norm, no dropout.

(reference experiments/sanity_check_minimal.py)
Run: python experiments/sanity_check_minimal.py
"""

from _lab import LabModel, overfit, sentence_batch


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    print("minimal model (embed -> Linear -> head):")
    _, trace = overfit(LabModel(variant="minimal"), x, y, steps=600)
    assert trace[-1] < 1.0, "the training harness itself is broken"
    print("minimal sanity check PASSED (harness + loss + optimizer are sound)")


if __name__ == "__main__":
    main()
