"""Is OUR loss pattern right?  Shifted-window CE on tiny integer data vs a
hand-computed cross-entropy.

(reference experiments/test_our_loss.py)
Run: python experiments/test_our_loss.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from spectral_tpu.train.evaluate import cross_entropy


def main():
    x = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    y = jnp.asarray([[2, 3, 4, 5]], jnp.int32)  # next-byte targets
    logits = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 256))

    got = float(cross_entropy(logits, y))
    # hand-computed: mean over positions of -log softmax[target]
    l = np.asarray(logits, np.float64)[0]
    z = l - l.max(axis=-1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=-1, keepdims=True))
    want = -np.mean([logp[t, int(y[0, t])] for t in range(4)])
    print(f"cross_entropy={got:.6f}  hand-computed={want:.6f}")
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # the golden pattern: targets are inputs shifted by one
    assert (np.asarray(x)[0, 1:] == np.asarray(y)[0, :-1]).all()
    print("loss pattern CONFIRMED: shifted-window CE matches the golden pattern")


if __name__ == "__main__":
    main()
