"""TPU-native monocular ORB-SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
C++ system b51/ceres_mono_orb_slam2 (monocular ORB-SLAM2 with a Ceres-based
optimizer). Heavy numerics (ORB extraction, Hamming matching, RANSAC solvers,
bundle adjustment, pose-graph optimization, bag-of-words place recognition)
run as jit/vmap/Pallas device code; tracking / local-mapping / loop-closing
orchestration and the covisibility graph live on the host.

See SURVEY.md at the repo root for the structural analysis of the reference
this build follows.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM geometry (pose math, Jacobians, Schur solves) needs true float32
# matmuls; TPU's default MXU precision is bf16-ish which breaks optimizer
# convergence. Hot integer-like matmuls (descriptor Hamming popcount) opt
# back into lower precision explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

# The axon environment pins the platform via sitecustomize, which beats the
# JAX_PLATFORMS env var; re-apply the user's explicit choice so
# JAX_PLATFORMS=cpu actually selects the CPU backend.
import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

# Persistent compilation cache: the fused SLAM pipelines take minutes to
# compile (especially through the remote-TPU tunnel); cache compiled
# executables on disk so repeated runs skip XLA entirely. Opt out with
# CERES_TPU_NO_COMPILE_CACHE=1.
if not _os.environ.get("CERES_TPU_NO_COMPILE_CACHE"):
    # default cache location: <repo>/.jax_cache (gitignored) — survives
    # across sessions on the same machine so the end-of-round bench and any
    # later run start fully warm (/tmp is commonly wiped between sessions);
    # falls back to /tmp when the package is installed read-only
    _repo_cache = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")
    _default_cache = (_repo_cache
                      if _os.access(_os.path.dirname(_repo_cache), _os.W_OK)
                      else "/tmp/ceres_tpu_jax_cache")
    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR", _default_cache)
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        # cache EVERYTHING: steady-state bucket-growth compiles are 0.1-3 s
        # each and there are dozens per session — all must amortize to zero
        # across runs (the reference compiles once at build time)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without the knobs: run uncached
        pass

from ceres_mono_orb_slam2_tpu.utils.config import SlamConfig, load_config  # noqa: F401

# Lazy top-level exports (PEP 562): the System facade pulls in the whole
# model stack (~1 s of imports + jit registrations), so `import
# ceres_mono_orb_slam2_tpu` stays light for config-only users while
# `slam.MonoSLAM(...)` works like the reference's `ORB_SLAM2::System`.
_LAZY = {
    "MonoSLAM": ("ceres_mono_orb_slam2_tpu.models.system", "MonoSLAM"),
    "Map": ("ceres_mono_orb_slam2_tpu.models.map", "Map"),
    "Tracking": ("ceres_mono_orb_slam2_tpu.models.tracking", "Tracking"),
}


def __getattr__(name):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    value = getattr(importlib.import_module(target[0]), target[1])
    globals()[name] = value
    return value
