"""focr_tpu — TPU-native rebuild of aconz2/font-ocr (reference at /root/reference).

Layers (SURVEY.md §1 re-layering):
  fonts/     L1 host font layer: ctypes FreeType + startup template banks
  ops/       L2/L3 device kernels: exact-integer SSD + NCC (XLA + Pallas)
  models/    L4 decode engines: focr grid decoder, ncc matcher, post-processing
  parallel/  L5 page-mesh scale-out (shard_map over jax.sharding.Mesh)
  io/        L0 image I/O, overlays, synthetic corpora
  cli/       L6 flag-parity focr/ncc command-line entry points
  oracle/    stage-0 NumPy reference semantics (test oracle)
  native/    C++ host fallback kernel (differential oracle for the device path)
"""

import os as _os

import jax as _jax

# int64 is required for exact full-page integral arithmetic on large pages
# (sum-of-squares cumsums exceed 2^31). All device float math remains
# explicitly f32/bf16 — no f64 ever reaches the TPU.
_jax.config.update("jax_enable_x64", True)

_compile_cache_decided = False


def enable_compile_cache() -> None:
    """Persistent XLA compilation cache: first-compile latency through the
    remote TPU backend is high and highly variable (seconds to minutes);
    caching makes every CLI invocation after the first start instantly.

    Called lazily by the compiling entry points (GridDecoder / NccMatcher /
    PropDecoder constructors) so importing the package never forces backend
    initialization. Opt out with FOCR_TPU_NO_COMPILE_CACHE=1. Never enabled
    when the RESOLVED backend is CPU (not just when JAX_PLATFORMS says so):
    CPU AOT artifacts bake in the compiling host's -march features, and
    loading them on a different machine — e.g. via an NFS home dir — risks
    SIGILL."""
    global _compile_cache_decided
    if _compile_cache_decided or _os.environ.get("FOCR_TPU_NO_COMPILE_CACHE"):
        return
    _compile_cache_decided = True
    if _jax.default_backend() == "cpu":
        return
    _cache = _os.environ.get(
        "FOCR_TPU_COMPILE_CACHE", _os.path.expanduser("~/.cache/focr_tpu_xla")
    )
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


__version__ = "0.1.0"
