"""On-chip flagship-shape parity gate for the fused Pallas kernels.

VERDICT r2 weak #3: the interpret-mode parity suites pin the kernels' jnp
twins, but the MOSAIC-compiled programs have diverged from interpret mode
before (the int32/uint32 PRNG bitcast bug was compiled-only).  This script
runs fp32, dropout=0 value+grad parity at REAL shapes on the REAL chip:

  * whole-block kernel at the flagship shape (d512, T=1024, 6-ish layers
    scaled to fit a quick run)
  * tail route at seq 4096 (the long-seq default)

against the flax ``FixedSpectralLM.apply`` oracle at rtol 1e-4.
Mirrors the reference's backend-equivalence pattern
(/root/reference/tests/integration/test_performance.py:126-142).

Run (chip, one job at a time, background):
    python -m experiments.fused_chip_parity [--layers 2]
"""

from __future__ import annotations

import argparse


def _rel_err(a, b):
    import numpy as np

    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    denom = max(float(np.abs(b).max()), 1e-12)
    return float(np.abs(a - b).max() / denom)


def run_case(tag, cfg, force_path, cutoff_val, rtol=1e-4):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from spectral_tpu.models.backbone import FixedSpectralLM
    from spectral_tpu.models.fused_apply import fused_lm_apply
    from spectral_tpu.train.evaluate import cross_entropy

    model = FixedSpectralLM(cfg)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 256, (2, cfg.seq_len)).astype(np.int32))
    tgt = jnp.asarray(rng.integers(0, 256, (2, cfg.seq_len)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), toks)
    cutoff = jnp.int32(cutoff_val)

    ref_fwd = jax.jit(lambda v: model.apply(v, toks, cutoff=cutoff, deterministic=True))
    fused_fwd = jax.jit(lambda p: fused_lm_apply(
        p, toks, cfg, cutoff=cutoff, deterministic=True, force_path=force_path))

    ref = ref_fwd(variables)
    got = fused_fwd(variables["params"])
    jax.block_until_ready((ref, got))
    e_fwd = _rel_err(got, ref)

    g_ref = jax.jit(jax.grad(lambda v: cross_entropy(
        model.apply(v, toks, cutoff=cutoff, deterministic=True), tgt)))(variables)["params"]
    g_fus = jax.jit(jax.grad(lambda p: cross_entropy(
        fused_lm_apply(p, toks, cfg, cutoff=cutoff, deterministic=True,
                       force_path=force_path), tgt)))(variables["params"])
    jax.block_until_ready((g_ref, g_fus))

    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_fus))
    e_grad, worst = 0.0, ""
    for path, leaf_r in flat_r:
        e = _rel_err(flat_f[path], leaf_r)
        if e > e_grad:
            e_grad, worst = e, jax.tree_util.keystr(path)

    ok = e_fwd < rtol and e_grad < rtol
    print(f"[{tag}] fwd_rel={e_fwd:.2e}  grad_rel={e_grad:.2e} (worst {worst})  "
          f"{'OK' if ok else 'FAIL'} (rtol {rtol})", flush=True)
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2,
                    help="layers per case (2 keeps compile minutes sane; the "
                         "kernel program is identical per layer)")
    args = ap.parse_args()

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    import jax

    # TPU matmuls at DEFAULT precision round fp32 inputs to bf16 (2e-3 rel
    # class — CLAUDE.md).  The flax oracle's Dense layers use DEFAULT, the
    # in-kernel Mosaic dots don't replicate that rounding, so a DEFAULT run
    # measures precision mismatch, not kernel correctness (first run: 8e-4
    # fwd / 4e-3 grad, worst on the pooled gate path).  Pin everything to
    # true fp32 so the gate isolates the compiled kernel's math.
    jax.config.update("jax_default_matmul_precision", "highest")

    print(f"backend: {jax.default_backend()}", flush=True)

    common = dict(d_model=512, n_layers=args.layers, kernel_len=128,
                  dropout=0.0, compute_dtype="float32",
                  fft_precision="highest")
    ok1 = run_case(
        "whole-block d512 T1024",
        TrainConfig(seq_len=1024, fft_backend="direct", **common),
        "block", cutoff_val=513,
    )
    ok2 = run_case(
        "tail d512 T4096",
        TrainConfig(seq_len=4096, fft_backend="matmul", **common),
        "tail", cutoff_val=2049,
    )
    print(f"RESULT: {'PASS' if (ok1 and ok2) else 'FAIL'}", flush=True)


if __name__ == "__main__":
    main()
