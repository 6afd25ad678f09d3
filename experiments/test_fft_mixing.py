"""FFT axis correctness probe (reference experiments/test_fft_mixing.py +
debug_fft_axis.py): mixing must run over TIME (axis 1), not channels.

A time-axis FFT mix lets position t see position t' != t of the SAME channel;
a channel-axis mix would not.  This probe fails loudly if the axis is wrong.

Run: python experiments/test_fft_mixing.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from spectral_tpu.layers.spectral_layers import SpectralMixingLayer


def main():
    B, T, D = 1, 32, 8
    layer = SpectralMixingLayer(D, learnable=False)
    params = layer.init(jax.random.PRNGKey(0), jnp.zeros((B, T, D)))

    # impulse at (t=5, d=2); non-learnable layer is identity, so probe the
    # LEARNABLE layer with non-trivial weights instead
    layer = SpectralMixingLayer(D, num_filters=D, learnable=True)
    x = jnp.zeros((B, T, D)).at[0, 5, 2].set(1.0)
    params = layer.init(jax.random.PRNGKey(1), x)
    params = jax.tree.map(lambda l: l + 0.3, params)  # break identity
    y = np.asarray(layer.apply(params, x))

    spread_time = np.abs(y[0, :, 2]).sum() - np.abs(y[0, 5, 2])
    spread_chan = np.abs(y[0, 5, :]).sum() - np.abs(y[0, 5, 2])
    print(f"energy spread across TIME (same channel): {spread_time:.4f}")
    print(f"energy spread across CHANNELS (same pos): {spread_chan:.4f}")
    assert spread_time > 1e-3, "FFT MIXING IS ON THE WRONG AXIS (no time mixing!)"
    print("fft axis PASSED: mixing runs over the sequence axis")


if __name__ == "__main__":
    main()
