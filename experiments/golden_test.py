"""Golden test: is the toolchain itself sane? (reference experiments/golden_test.py)

The first rung of the debugging ladder (SURVEY.md §4): before suspecting any
spectral machinery, verify a plain dense layer can fit y = 2x + 1 with the
same optimizer stack the trainers use.

Run: python experiments/golden_test.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 8)).astype(np.float32))
    y = 2.0 * x + 1.0

    model = nn.Dense(8)
    params = model.init(jax.random.PRNGKey(0), x)
    tx = optax.adam(3e-2)
    state = tx.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(lambda p: jnp.mean((model.apply(p, x) - y) ** 2))(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    for i in range(600):
        params, state, l = step(params, state)
    print(f"final mse: {float(l):.6f}")
    assert float(l) < 1e-3, "GOLDEN TEST FAILED — the training stack itself is broken"
    print("golden test PASSED: optimizer/jit stack is sane")


if __name__ == "__main__":
    main()
