"""Stateful chunked generation: FIR streaming backbone + chunk head.

Mirror of reference scripts/generate_chunked_stateful.py: the backbone is
advanced per token with the O(K) FIR ring buffer (approximate: freq gate
dropped, context gate per-token), the chunk head predicts the next chunk
from the streamed hidden state, and the sampled clean bytes are re-encoded
through the stream (bytes are the state boundary — quantization barrier).
"""

from __future__ import annotations

import argparse

import numpy as np

from scripts._common import apply_platform_env


def main(argv=None) -> None:
    apply_platform_env()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="chunklm_ckpt.msgpack")
    ap.add_argument("--prompt", nargs="+", default=["Once", "upon", "a", "time"])
    ap.add_argument("--chunks", type=int, default=30)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--top-p", type=float, default=0.9)
    ap.add_argument("--rep", type=float, default=1.15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from spectral_tpu.models.config import TrainConfig
    from spectral_tpu.streaming.fir import FIRStream, _layernorm
    from spectral_tpu.train.ckpt import load_checkpoint
    from spectral_tpu.train.sampling import apply_top_p, safe_console

    ck = load_checkpoint(args.ckpt)
    cfg = TrainConfig.from_dict(ck.get("cfg", {}))
    chunk = int(ck.get("chunk", 16))
    params = ck["params"]
    backbone = params.get("backbone", params)
    head = params.get("head")
    if head is None:
        raise SystemExit("checkpoint has no chunk head")
    h_kernel = jnp.asarray(head["kernel"])
    h_bias = jnp.asarray(head["bias"])

    stream = FIRStream(backbone, cfg)

    @jax.jit
    def step_hidden(state, byte_id):
        """Feed one byte; return (new_state, final-hidden [1, C])."""
        hidden, state = stream._token_step(stream.params, byte_id, state)
        hidden = _layernorm(hidden, stream.params["ln_f"]["scale"], stream.params["ln_f"]["bias"])
        return state, hidden

    ctx = list(" ".join(args.prompt).encode("utf-8", errors="ignore")) or [32]
    state = stream.init_state(1)
    if len(ctx) > 1:
        state = stream.warmup(state, np.asarray([ctx[:-1]], np.int32))
    last = ctx[-1]
    generated = ctx[:]
    rng = np.random.default_rng(args.seed)

    for _ in range(args.chunks):
        state, hidden = step_hidden(state, jnp.asarray([last], jnp.int32))
        flat = hidden @ h_kernel + h_bias
        logits = np.asarray(flat.reshape(chunk, 256), np.float64)

        new_bytes = []
        for i in range(chunk):
            l = logits[i].copy()
            for tok in set(generated[-256:]):
                l[tok] = l[tok] / args.rep
            l = l / args.temperature
            l = apply_top_p(l, args.top_p)
            z = l - l.max()
            p = np.exp(z)
            p /= p.sum()
            new_bytes.append(int(rng.choice(256, p=p)))
        print(safe_console(bytes(new_bytes).decode("utf-8", errors="replace")), end="", flush=True)

        # re-encode clean bytes through the stream; keep the final byte as `last`
        if len(new_bytes) > 1:
            state = stream.warmup(state, np.asarray([new_bytes[:-1]], np.int32))
        last = new_bytes[-1]
        generated.extend(new_bytes)
    print()


if __name__ == "__main__":
    main()
