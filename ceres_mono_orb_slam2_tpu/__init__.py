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

from ceres_mono_orb_slam2_tpu.utils.config import SlamConfig, load_config  # noqa: F401
