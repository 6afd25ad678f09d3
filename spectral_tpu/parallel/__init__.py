"""spectral_tpu.parallel — device meshes and sharded training.

No reference counterpart (the reference is single-GPU, SURVEY.md §2.10);
this layer is designed TPU-first: a named mesh with dp/sp/tp axes, param and
activation sharding rules, and XLA collectives over ICI.
"""

from spectral_tpu.parallel.mesh import (
    make_mesh,
    mesh_axis_sizes,
    param_pspecs,
    batch_pspec,
)

__all__ = ["make_mesh", "mesh_axis_sizes", "param_pspecs", "batch_pspec"]
