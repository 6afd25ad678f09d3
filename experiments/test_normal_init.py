"""Init study: normal init with a STRONG residual (maybe tiny init is too
conservative — let the residual carry the signal while the mixer learns).

(reference experiments/test_normal_init.py)
Run: python experiments/test_normal_init.py
"""

from _lab import LabModel, overfit, sentence_batch


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    print("normal init + strong residual (x + 0.1*mix):")
    _, trace = overfit(LabModel(variant="normal_residual"), x, y)
    assert trace[-1] < 0.5, "strong-residual variant failed to memorize"
    print("normal-init study PASSED")


if __name__ == "__main__":
    main()
