"""safepy_tpu — a TPU-native framework for Spatial Analysis of Functional Enrichment (SAFE).

A ground-up JAX/XLA/Pallas re-design of the capabilities of baryshnikova-lab/safepy
(reference layout: safepy/safe.py, safepy/safe_io.py, safepy/safe_extras.py): given a
biological network and a matrix of node attributes, SAFE

  1. defines a local neighborhood around every node (all-pairs shortest paths on TPU,
     blocked min-plus Floyd-Warshall Pallas kernel — `safepy_tpu.ops.apsp`),
  2. runs a statistical enrichment test of every attribute in every neighborhood
     (hypergeometric survival function / batched permutation null on the MXU —
     `safepy_tpu.ops.hypergeom`, `safepy_tpu.ops.permutation`),
  3. clusters co-enriched attributes into domains (`safepy_tpu.domains`),
  4. renders the functional landscape (`safepy_tpu.plotting`).

SAFE has no neural networks — the "models" this framework ships are the compiled
end-to-end analysis programs at three altitudes: the stateful `SAFE` session (the
eager interface), the fused jit programs in `safepy_tpu.pipeline` (graph +
attributes in, enrichment out, one dispatch), and their mesh-sharded multi-chip
compositions in `safepy_tpu.parallel`.

Architecture (three tiers, replacing the reference's god-class internals):

  * device core (`safepy_tpu.ops`, `safepy_tpu.parallel`) — pure functions on arrays,
    jit-compiled for TPU; multi-chip scaling via `jax.sharding.Mesh` + `shard_map`.
  * host graph/data layer (`safepy_tpu.io`) — file loaders, layouts, attribute alignment.
  * facade (`safepy_tpu.safe.SAFE`) — API-compatible with the reference `SAFE` class
    (same method names, kwargs, instance attributes, INI config).

Precision policy: SAFE statistics are pinned to <=1e-6 p-value parity with SciPy
oracles. The package enables JAX x64 on import (opt out with SAFEPY_TPU_X64=0 in the
environment *before* importing) so host<->device round trips keep f64 semantics; the
hot kernels pick their own compute dtypes explicitly (f32/bf16 on the MXU/VPU, f64
only where statistical parity requires it).
"""

import os as _os

import jax as _jax

if _os.environ.get("SAFEPY_TPU_X64", "1") != "0":
    _jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: compiled executables are serialized to
# disk and reloaded by later processes, skipping the (remote, 1 s-10 min per
# signature) TPU compile entirely — measured on the tunneled v5e: a fresh
# process re-running the 99,840 x 4,373 flagship workflow spends ~2/3 of its
# wall time in compiles that a warm cache eliminates. Opt out or redirect
# with SAFEPY_TPU_COMPILE_CACHE=0 / =<dir>. An EXPLICIT =<dir> wins over a
# cache dir already set via jax config / JAX_COMPILATION_CACHE_DIR (the
# operator asked for it by name); the IMPLICIT default never overrides one.
_cache = _os.environ.get("SAFEPY_TPU_COMPILE_CACHE", "")
if _cache not in ("", "0") or (
        _cache != "0"
        and _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu"
        and not _jax.config.jax_compilation_cache_dir
        and not _os.environ.get("JAX_COMPILATION_CACHE_DIR")):
    # an EXPLICIT dir wins on any platform (tests pin the round trip on the
    # CPU backend); the implicit default stays off under JAX_PLATFORMS=cpu
    # so the pytest suite never writes a cache
    _jax.config.update(
        "jax_compilation_cache_dir",
        _cache or _os.path.expanduser("~/.cache/safepy_tpu/xla"))
    # cache EVERY program: jax's default 1 s floor re-compiles the many
    # small chunk-dispatch programs remotely (1-3 s each on the tunnel)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"

__all__ = ["SAFE", "ops", "safe_io", "__version__"]


def __getattr__(name):
    # Lazy top-level imports keep `import safepy_tpu.ops.x` cheap and cycle-free.
    import importlib

    if name == "SAFE":
        return importlib.import_module("safepy_tpu.safe").SAFE
    if name == "ops":
        return importlib.import_module("safepy_tpu.ops")
    if name == "safe_io":
        return importlib.import_module("safepy_tpu.io")
    raise AttributeError(f"module 'safepy_tpu' has no attribute {name!r}")
