"""Device mesh construction and sharding rules.

Parallelism design for the spectral LM (TPU-native, no reference counterpart):

* **dp** — data parallel: batch axis sharded; XLA psums grads over ICI.
* **sp** — sequence parallel: the time axis of activations is sharded through
  the pointwise segments (embed/LN/FFN are elementwise over time).  The FFT
  segment needs the full time axis per channel; XLA re-shards around
  ``jnp.fft`` automatically (the explicit Ulysses-style all-to-all —
  time-sharded <-> channel-sharded — lives in parallel/distributed_fft.py).
* **tp** — tensor parallel: FFN hidden dim and embedding width sharded
  (column-parallel in, row-parallel out => one psum per FFN, one for tied
  logits), and the per-channel spectral params (gain) shard with the channel
  axis: the time-axis FFT is embarrassingly parallel over channels, so the
  whole spectral conv is communication-free under tp.

``pp`` (pipeline) is intentionally absent at this model scale (SURVEY.md
§2.10: "not needed at reference scale").
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def mesh_axis_sizes(n_devices: int) -> tuple[int, int, int]:
    """Factor n_devices into (dp, sp, tp) sizes.

    Greedy: tp gets a factor of 2 first (FFN hidden dims are wide), then sp,
    then dp absorbs the rest.  All sizes are powers of two for TPU topologies.
    """
    n = int(n_devices)
    assert n >= 1 and (n & (n - 1)) == 0, f"n_devices must be a power of two, got {n}"
    tp = 2 if n >= 2 else 1
    sp = 2 if n >= 4 else 1
    dp = n // (tp * sp)
    return dp, sp, tp


def make_mesh(
    n_devices: Optional[int] = None,
    *,
    dp: Optional[int] = None,
    sp: Optional[int] = None,
    tp: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ("dp", "sp", "tp") mesh over the available devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs) if dp is None else dp * (sp or 1) * (tp or 1)
    if dp is None or sp is None or tp is None:
        dp, sp, tp = mesh_axis_sizes(n_devices)
    assert dp * sp * tp <= len(devs), f"need {dp*sp*tp} devices, have {len(devs)}"
    grid = np.asarray(devs[: dp * sp * tp]).reshape(dp, sp, tp)
    return Mesh(grid, axis_names=("dp", "sp", "tp"))


def batch_pspec(with_accum: bool = False) -> P:
    """Sharding of LM batches: batch -> dp, time -> sp."""
    if with_accum:
        return P(None, "dp", "sp")
    return P("dp", "sp")


def param_pspecs(params) -> dict:
    """PartitionSpec pytree for the spectral LM params.

    Rules (matched by leaf path suffix):
      embed/embedding (V, D)    -> P(None, "tp")   width-sharded
      ffn_in/kernel  (D, H)     -> P(None, "tp")   column parallel
      ffn_out/kernel (H, D)     -> P("tp", None)   row parallel (psum out)
      gain (C,) / gate_ctx bias -> replicated (small)
      everything else           -> replicated
    """

    def rule(path, leaf) -> P:
        names = [str(getattr(k, "key", k)) for k in path]
        name = "/".join(names)
        shape = np.shape(leaf)
        if name.endswith("embed/embedding") and len(shape) == 2:
            return P(None, "tp")
        if "ffn_in" in name and name.endswith("kernel") and len(shape) == 2:
            return P(None, "tp")
        if "ffn_out" in name and name.endswith("kernel") and len(shape) == 2:
            return P("tp", None)
        if "ffn_in" in name and name.endswith("bias"):
            return P("tp")
        if ("w1" in names) and name.endswith("kernel") and len(shape) == 2:
            return P(None, "tp")
        if ("w2" in names) and name.endswith("kernel") and len(shape) == 2:
            return P("tp", None)
        if ("w1" in names) and name.endswith("bias"):
            return P("tp")
        # NOTE (round 5): the frequency-native per-(bin, channel) params
        # (SpectralLayerNorm gamma/beta [fbins, C], PhaseShift weights
        # [fbins, H]) stay REPLICATED even under sp, and that replication
        # is what the 485 MB/step of GSPMD all-gathers in the freq-native
        # sp leg pays for (MULTICHIP_NOTES round 5): the sp route computes
        # with bin-sharded activations, so each shard produces only its
        # bins' param grads and the replicated update must all-gather
        # them — the MINIMAL correct collective for this layout.
        # Bin-sharding them (P("sp", None)) would make grads/optimizer
        # collective-free and halve their per-chip memory, but
        # NamedSharding requires the bins axis to divide sp and fbins =
        # 2^k + 1 is odd; the fix is storing these params PADDED to a
        # multiple-of-8 bin count (with ckpt resize + zero-grad padded
        # rows), which changes the canonical param shapes and is left as
        # the quantified next optimization, not silently half-done here.
        return P()

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Device-put params according to :func:`param_pspecs`."""
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, specs
    )
