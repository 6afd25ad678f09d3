"""Break the flagship train step into parts on the real chip.

Where do the 19.3 ms/step (fast mode) go?  Times, with the bench.py
methodology (whole loop inside ONE jit, marginal cost t(N)-t(1), value
fetch), each of:

  fwd        loss only
  fwdbwd     loss + grads (no optimizer)
  step       full train step (accum scan + AdamW)

for a sweep of configurations (fft backend / precision / compute_dtype /
accum layout).  Usage:

  PYTHONPATH=/root/.axon_site:. python experiments/profile_train_step.py \
      --iters 30 --variants default,bf16,noaccum

Reference for the recipe being profiled: /root/reference/README.md:384-397
(d512 x 6, seq 1024, kernel 128, batch 4 x accum 8).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build(cfg_overrides: dict, part: str):
    import jax
    import jax.numpy as jnp
    import optax

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.train.evaluate import cross_entropy
    from spectral_tpu.train.trainer import init_model, make_optimizer, make_train_step

    base = dict(
        d_model=512, n_layers=6, seq_len=1024, kernel_len=128,
        batch_size=4, accum_steps=8, dropout=0.0,
        fft_backend="matmul", fft_precision="default",  # the TPU training default
    )
    base.update(cfg_overrides)
    cfg = TrainConfig(**base)
    model, params = init_model(cfg)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    shape = (cfg.accum_steps, cfg.batch_size, cfg.seq_len)
    bx = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
    by = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
    cutoff = jnp.int32(512)
    lr = jnp.float32(2e-4)
    key = jax.random.PRNGKey(0)

    def loss_fn(params, mbx, mby):
        logits = model.apply({"params": params}, mbx, cutoff=cutoff, deterministic=True)
        return cross_entropy(logits, mby)

    if part == "step":
        step = make_train_step(model, cfg, tx)

        def loop(params, opt_state, bx, by, n):
            def body(i, carry):
                p, o, _ = carry
                p, o, l = step(p, o, bx, by, cutoff, lr, jax.random.fold_in(key, i))
                return (p, o, l)
            _, _, l = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0)))
            return l

        run = jax.jit(loop, static_argnums=4)
        args = (params, opt_state, bx, by)
    elif part == "fwdbwd":
        def loop(params, bx, by, n):
            def body(i, carry):
                p, _ = carry
                def micro(c, xs):
                    g_acc, l_acc = c
                    mbx, mby = xs
                    l, g = jax.value_and_grad(loss_fn)(p, mbx, mby)
                    return (jax.tree.map(lambda a, b: a + b, g_acc, g), l_acc + l), None
                g0 = jax.tree.map(jnp.zeros_like, p)
                (g, lsum), _ = jax.lax.scan(micro, (g0, 0.0), (bx, by))
                # fold grads back into params so the loop has no fixed point
                p = jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)
                return (p, lsum)
            _, l = jax.lax.fori_loop(0, n, body, (params, jnp.float32(0)))
            return l

        run = jax.jit(loop, static_argnums=3)
        args = (params, bx, by)
    elif part == "fwd":
        def loop(params, bx, by, n):
            def body(i, carry):
                p, _ = carry
                def micro(l_acc, xs):
                    mbx, mby = xs
                    return l_acc + loss_fn(p, mbx, mby), None
                lsum, _ = jax.lax.scan(micro, 0.0, (bx, by))
                return (p, lsum)
            _, l = jax.lax.fori_loop(0, n, body, (params, jnp.float32(0)))
            return l

        run = jax.jit(loop, static_argnums=3)
        args = (params, bx, by)
    else:
        raise ValueError(part)

    return run, args


def timeit(run, args, iters):
    t_fn = lambda n: run(*args, n)
    float(t_fn(1))
    float(t_fn(iters))

    def timed(n, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(t_fn(n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(timed(iters) - timed(1), 1e-9) / (iters - 1)


VARIANTS = {
    # the TPU training default (what bench.py measures)
    "default": {},
    # bf16 FFN/logits matmuls
    "bf16": {"compute_dtype": "bfloat16"},
    # no accum scan: one batch of 32 (same tokens/step)
    "noaccum": {"batch_size": 32, "accum_steps": 1},
    "noaccum_bf16": {"batch_size": 32, "accum_steps": 1, "compute_dtype": "bfloat16"},
    # fp32-accurate stages
    "highest": {"fft_precision": "highest"},
    # curriculum-static band-limited conv idea: approximate the win by
    # running with a smaller n_fft (rank proxy) is NOT valid — skip.
    # fused Pallas kernel path
    "pallas": {"use_pallas_kernel": True, "fft_backend": "xla"},
    # no remat (if default has it)
    "noremat": {"remat": False},
    "remat": {"remat": True},
    "xla_fft": {"fft_backend": "xla"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--variants", default="default,bf16,noaccum")
    ap.add_argument("--parts", default="step,fwdbwd,fwd")
    args = ap.parse_args()

    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    from spectral_tpu.ops import matfft

    matfft.set_precision(jax.lax.Precision.DEFAULT)  # TPU fast-mode default

    tokens = 32768
    for v in args.variants.split(","):
        over = VARIANTS[v]
        for part in args.parts.split(","):
            t0 = time.time()
            run, a = build(over, part)
            dt = timeit(run, a, args.iters)
            print(json.dumps({
                "variant": v, "part": part, "ms": round(dt * 1e3, 3),
                "tokens_per_sec": round(tokens / dt, 1),
                "build_s": round(time.time() - t0, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
