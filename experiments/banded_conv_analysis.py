"""Curriculum-banded conv (VERDICT r2 next #2): exact-rank analysis.

CLAIM UNDER TEST: "while cutoff < fbins the fused filter is band-limited,
so the Toeplitz conv can run as two (T, k) panels — expect ~2x on the conv
term during the cutoff-128 phase."

RESULT: the claim is HALF right.  The repo's causal-taps projection
(ops/fftc.causal_filter_taps, the deliberate fix of the reference's future
leak) destroys the plain two-panel structure — windowing in time is
circular convolution in frequency, so the windowed filter is NOT
band-limited and no (T, k) panel pair reproduces the conv.  What survives
is the harder causal-low-rank form M = tril(U V^T) that needs a chunked
prefix scan.  Its exact FLOP factor vs the dense Toeplitz at the flagship
cutoff-128 phase is 0.62x (not the 2x a clean band-limited factorization
would give), improving to 0.31x / 0.16x at T = 2048 / 4096.  Whether the
theoretical 0.62x survives the scan's serialization overhead is an
EMPIRICAL question — measured by experiments/banded_conv_measure.py.

The derivation (verified numerically below):

1. A band-limited circulant IS rank-2k:  C = F_k^H diag(ĥ) F_k.  But the
   training conv is NOT that circulant — it is the T-restricted Toeplitz of
   the first L = n_fft - T time taps:  M[i,j] = h_w[i-j] * 1[0 <= i-j < L],
   with h_w = irfft(ĥ_band).  Windowing in time is circular convolution in
   frequency: h_w is no longer band-limited, so no (T, k) panel pair
   reproduces M.

2. What survives: each tap is a 2k-term cos/sin sum, and angle-difference
   identities make h_w[i-j] SEPARABLE on the causal region:

       M = tril(U V^T),   U, V : (T, 2k)   [L = T at flagship shapes]

   i.e. exactly the "causal low-rank" structure of linear-attention — it
   can only be evaluated with a chunked prefix scan, never two plain
   matmuls (tril() of a product is not a product).

3. Chunked-prefix-scan cost per token per channel with chunk S:
       f(S) = 2 * 2k_pad + S        (two panel matmuls + local band)
   vs the dense Toeplitz matmul's  T.
   Flagship cutoff-128 phase: 2k-1 = 255 -> MXU-padded 256; best S = 128:
       f = 2*256 + 128 = 640  vs  T = 1024     (0.62x the conv FLOPs)
   The conv term is ~20% of the fused step at T=1024 => ~7% step-level
   ceiling, BEFORE the scan's serialization overhead (the Pallas
   bandlimited negative result, ops/pallas_bandlimited.py, showed exactly
   this overhead class eating a larger theoretical win).  At T >= 2048 the
   factor improves (0.31x / 0.16x) but those sequence lengths dispatch to
   the matmul-FFT conv, which is already O(T log T).

4. The clean ~2x the VERDICT expected exists only if the curriculum mask
   were applied AFTER the causal projection — a DIFFERENT training math
   than the flax path (parity-gated) computes.  Changing the model to keep
   the filter band-limited post-projection is a design change, not a
   kernel optimization, and would need its own descent/quality evaluation.

Run:  python -m experiments.banded_conv_analysis   (CPU, seconds)
"""

from __future__ import annotations

import numpy as np


def tril_uv_identity(T: int, n_fft: int, k_act: int, seed: int = 0) -> float:
    """Numerically verify M_causal == tril(U V^T) for a band-limited filter
    under the causal-taps window (L = n_fft - T >= T assumed, as at all
    flagship shapes where n_fft = 2T).  Returns max abs error."""
    rng = np.random.default_rng(seed)
    fbins = n_fft // 2 + 1
    h_hat = np.zeros(fbins, np.complex128)
    h_hat[:k_act] = rng.normal(size=k_act) + 1j * rng.normal(size=k_act)
    h_hat[0] = h_hat[0].real  # DC is real

    h_time = np.fft.irfft(h_hat, n=n_fft)
    # causal-taps window: keep taps [0, L), L = n_fft - T
    L = n_fft - T
    assert L >= T, "analysis covers the flagship regime n_fft = 2T"
    # the T-restricted Toeplitz uses taps [0, T) only (i-j < T)
    idx_i, idx_j = np.meshgrid(np.arange(T), np.arange(T), indexing="ij")
    diff = idx_i - idx_j
    M = np.where(diff >= 0, h_time[np.clip(diff, 0, n_fft - 1)], 0.0)

    # separable panels: per active bin f, weight w_f * [a_f cos - b_f sin]
    # h_w[d] = (1/n) sum_f w_f (a_f cos(2 pi f d / n) - b_f sin(2 pi f d / n))
    t = np.arange(T)
    cols_u, cols_v = [], []
    for f in range(k_act):
        w = 1.0 if f in (0, n_fft // 2) else 2.0
        a, b = h_hat[f].real, h_hat[f].imag
        c = np.cos(2 * np.pi * f * t / n_fft)
        s = np.sin(2 * np.pi * f * t / n_fft)
        # cos(d) = c_i c_j + s_i s_j ; sin(d) = s_i c_j - c_i s_j
        cols_u.append((w / n_fft) * (a * c - b * s))
        cols_v.append(c)
        cols_u.append((w / n_fft) * (a * s + b * c))
        cols_v.append(s)
    U = np.stack(cols_u, 1)  # (T, 2k)
    V = np.stack(cols_v, 1)
    M_lr = np.tril(U @ V.T)
    return float(np.abs(M - M_lr).max() / max(np.abs(M).max(), 1e-12))


def breakeven_table() -> list[tuple]:
    """Per-token-per-channel MAC factor of the chunked prefix scan
    f(S) = 2*2k_pad + S  vs the dense Toeplitz's T."""

    def pad128(x):
        return ((x + 127) // 128) * 128

    rows = []
    for T, cutoff, trans in ((1024, 128, 32), (1024, 256, 32), (2048, 128, 32),
                             (4096, 128, 32), (4096, 512, 64)):
        k_act = cutoff  # mask zeroes bins >= cutoff (ramp inside)
        two_k = pad128(2 * k_act - 1)  # DC has no sin column
        best = min((2 * two_k + S, S) for S in (128, 256, 512))
        rows.append((T, cutoff, two_k, best[1], best[0], T, best[0] / T))
    return rows


def main() -> None:
    err = tril_uv_identity(T=256, n_fft=512, k_act=40)
    print(f"tril(UV^T) identity max rel err (T=256, n=512, k=40): {err:.2e}")
    assert err < 1e-10, "the separable-decomposition derivation is wrong!"

    print("\nexact chunked-prefix-scan cost vs dense Toeplitz (per token/channel):")
    print(f"{'T':>6} {'cutoff':>7} {'2k_pad':>7} {'S*':>5} {'f(S*)':>7} {'dense':>6} {'ratio':>6}")
    for T, c, tk, S, f, d, r in breakeven_table():
        print(f"{T:>6} {c:>7} {tk:>7} {S:>5} {f:>7} {d:>6} {r:>6.2f}")
    print(
        "\nconclusion: the causal-taps projection forces the prefix-scan form\n"
        "(tril(UV^T)), capping the exact win at 0.62x conv FLOPs (cutoff-128,\n"
        "T=1024) — far from the 2x a clean band-limited factorization would\n"
        "give.  Measured verdict: experiments/banded_conv_measure.py."
    )


if __name__ == "__main__":
    main()
