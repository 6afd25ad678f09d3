"""Minimal model on an ACTUAL sentence: per-position predictions, eyeballed.

(reference experiments/test_sentence.py)
Run: python experiments/test_sentence.py
"""

import jax.numpy as jnp
import numpy as np

from _lab import LabModel, overfit, sentence_batch


def main():
    text = b"The quick brown fox jumps over the lazy dog and runs away home. "
    x, y = sentence_batch(text, T=48)
    model = LabModel(variant="freq_mix")
    params, trace = overfit(model, x, y, steps=600, log_every=200)

    logits = model.apply({"params": params}, x)
    pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
    want = np.asarray(y)[0]
    acc = float((pred == want).mean())
    print("target:", bytes(want.tolist()).decode(errors="replace"))
    print("pred:  ", bytes(int(p) for p in pred).decode(errors="replace"))
    print(f"next-byte accuracy: {acc:.2%}")
    assert acc > 0.9, "cannot reproduce a memorized sentence"
    print("sentence test PASSED")


if __name__ == "__main__":
    main()
