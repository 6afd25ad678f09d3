"""THE historical bug and its fix: mixing applied after the IFFT round-trip
(time domain — the round-trip is an identity, so no context ever mixes)
vs mixing applied IN the frequency domain.

(reference experiments/fix_frequency_mixing.py)
Run: python experiments/fix_frequency_mixing.py
"""

import jax
import jax.numpy as jnp

from _lab import LabModel, overfit, sentence_batch


def context_flow(model, params, x):
    """max |Δlogits| at earlier positions when the last token changes."""
    l1 = model.apply({"params": params}, x)
    x2 = x.at[0, -1].set((int(x[0, -1]) + 1) % 256)
    l2 = model.apply({"params": params}, x2)
    return float(jnp.abs(l1[0, :-1] - l2[0, :-1]).max())


def main():
    x, y = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)

    print("BROKEN variant (time-domain mixing after the IFFT):")
    broken = LabModel(variant="time_mix")
    p_b, t_b = overfit(broken, x, y)
    flow_b = context_flow(broken, p_b, x)

    print("FIXED variant (frequency-domain mixing):")
    fixed = LabModel(variant="freq_mix")
    p_f, t_f = overfit(fixed, x, y)
    flow_f = context_flow(fixed, p_f, x)

    print(f"context flow: broken={flow_b:.2e}  fixed={flow_f:.2e}")
    assert flow_b < 1e-5, "time-mix variant unexpectedly mixes context"
    assert flow_f > 1e-6, "freq-mix variant does not mix context"
    print("frequency-mixing fix CONFIRMED: only the freq-domain multiply mixes context")


if __name__ == "__main__":
    main()
