"""Init study: identity-initialized spectral filter (starts as pass-through,
gradually learns to mix) vs the default small-normal init.

(reference experiments/test_identity_init.py)
Run: python experiments/test_identity_init.py
"""

from _lab import LabModel, overfit, sentence_batch


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    print("identity-init spectral filter:")
    _, t_id = overfit(LabModel(variant="identity_init"), x, y)
    print("normal-init spectral filter:")
    _, t_nm = overfit(LabModel(variant="freq_mix"), x, y)
    print(f"final: identity={t_id[-1]:.4f}  normal={t_nm[-1]:.4f}")
    assert t_id[-1] < 0.5, "identity-init variant failed to memorize"
    print("identity-init study PASSED (pass-through start converges)")


if __name__ == "__main__":
    main()
