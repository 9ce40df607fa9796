"""Analysis "models": the end-to-end compiled programs this framework ships.

SAFE has no neural networks — the flagship "model" of this framework is the
enrichment analysis itself, packaged at three altitudes:

  * :class:`safepy_tpu.safe.SAFE` — the stateful, reference-compatible session
    (the "eager" interface);
  * :func:`safepy_tpu.pipeline.fused_permutation_pipeline` /
    :func:`safepy_tpu.pipeline.fused_hypergeom_pipeline` — the jit-compiled
    forward programs (graph + attributes in, enrichment out, one dispatch);
  * the sharded variants under :mod:`safepy_tpu.parallel` — the multi-chip
    "training-step"-shaped programs (mesh + collectives).

This module exists to make that inventory discoverable; everything here is a
re-export.
"""

from safepy_tpu.pipeline import (fused_hypergeom_pipeline,
                                 fused_permutation_pipeline)
from safepy_tpu.safe import SAFE, run_safe_batch

__all__ = [
    "SAFE",
    "run_safe_batch",
    "fused_permutation_pipeline",
    "fused_hypergeom_pipeline",
]
