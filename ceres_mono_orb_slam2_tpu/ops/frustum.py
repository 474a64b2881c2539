"""Batched frustum visibility + scale prediction for map points.

Device equivalent of Frame::isInFrustum (reference Frame.cc:191-241) and
MapPoint::PredictScale (MapPoint.cc:390-420), evaluated for the whole local
map at once: one jit call replaces the per-point host loop in
Tracking::SearchLocalPoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def frustum_and_scale(
    Rcw,  # (3, 3)
    tcw,  # (3,)
    K,  # (3, 3)
    bounds,  # (4,) [min_x, max_x, min_y, max_y] of undistorted image
    pos,  # (M, 3) world positions
    normal,  # (M, 3) viewing normals
    min_dist,  # (M,)
    max_dist,  # (M,)
    valid,  # (M,)
    log_scale,  # () log(scale_factor)
    n_levels,  # () int32
):
    """Returns (uv (M,2), level (M,), viewcos (M,), visible (M,))."""
    Xc = pos @ Rcw.T + tcw
    z = Xc[:, 2]
    zok = z > 0.0
    zs = jnp.where(zok, z, 1.0)
    u = K[0, 0] * Xc[:, 0] / zs + K[0, 2]
    v = K[1, 1] * Xc[:, 1] / zs + K[1, 2]
    in_img = (u >= bounds[0]) & (u < bounds[1]) & (v >= bounds[2]) & (v < bounds[3])

    Oc = -Rcw.T @ tcw
    PO = pos - Oc
    dist = jnp.linalg.norm(PO, axis=-1)
    # reference uses [0.8*min, 1.2*max] slack (MapPoint.cc:380-388)
    dist_ok = (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)

    viewcos = jnp.sum(PO * normal, axis=-1) / jnp.maximum(dist, 1e-9)
    view_ok = viewcos > 0.5

    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(ratio) / log_scale).astype(jnp.int32)
    level = jnp.clip(level, 0, n_levels - 1)

    visible = valid & zok & in_img & dist_ok & view_ok
    return jnp.stack([u, v], axis=-1), level, viewcos, visible
