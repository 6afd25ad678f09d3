"""Is the FFT on the right axis?  Does context actually flow?

(reference experiments/debug_fft_axis.py — prints magnitudes to see whether
information moves across positions.)  Two probes:
1. magnitude trace through the pipeline stages;
2. the decisive one: perturb a FUTURE token — with the FFT on the sequence
   axis the other positions' logits MUST change (global mixing); with the
   FFT on the feature axis they must NOT.

Run: python experiments/debug_fft_axis.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from _lab import LabModel, sentence_batch


def main():
    x, _ = sentence_batch(b"the quick brown fox jumps over the lazy dog. " * 2)
    model = LabModel(variant="freq_mix")
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    # probe 1: stage magnitudes (context should carry non-trivial energy)
    h = params["embed"]["embedding"][x]
    hf_seq = jnp.fft.rfft(h, axis=1)
    hf_feat = jnp.fft.rfft(h, axis=2)
    print(f"|embed| mean: {float(jnp.abs(h).mean()):.4f}")
    print(f"|rfft axis=1 (sequence)| mean: {float(jnp.abs(hf_seq).mean()):.4f}  bins={hf_seq.shape[1]}")
    print(f"|rfft axis=2 (feature)|  mean: {float(jnp.abs(hf_feat).mean()):.4f}  bins={hf_feat.shape[2]}")

    # probe 2: future-token perturbation
    logits = model.apply({"params": params}, x)
    x2 = x.at[0, -1].set((int(x[0, -1]) + 1) % 256)
    logits2 = model.apply({"params": params}, x2)
    moved = float(jnp.abs(logits[0, :-1] - logits2[0, :-1]).max())
    print(f"max |Δlogits| at other positions after perturbing the last token: {moved:.2e}")
    assert moved > 1e-6, "NO context flow — the FFT is not mixing the sequence axis"
    print("FFT axis check PASSED: sequence-axis FFT mixes context across positions")
    print("(note: global mixing is NON-causal — the production backbone replaces it")
    print(" with the zero-padded causal conv, models/backbone.py)")


if __name__ == "__main__":
    main()
