"""Pinhole camera model with OpenCV radial-tangential distortion.

Replaces the reference's use of cv::undistortPoints (Frame.cc:329-355
UndistortKeyPoints) and the K-projection math spread across the optimizers.
All functions are jnp, batched over leading dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def project(K, xyz):
    """Perspective projection of camera-frame points (no distortion —
    matches the reference's optimizer residuals which project undistorted).

    K: (3, 3); xyz: (..., 3). Returns (..., 2) pixels and (...,) depth.
    """
    z = xyz[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * xyz[..., 0] / safe_z + K[0, 2]
    v = K[1, 1] * xyz[..., 1] / safe_z + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def distort_normalized(xy, dist):
    """Forward OpenCV distortion on normalized coords. dist = (k1,k2,p1,p2,k3)."""
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(uv, K, dist, iters: int = 8):
    """Iteratively invert the distortion model (cv::undistortPoints
    equivalent): pixel coords in -> undistorted pixel coords out.

    uv: (..., 2). Fixed-point iteration (the same scheme OpenCV uses).
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    k1, k2, p1, p2, k3 = dist[0], dist[1], dist[2], dist[3], dist[4]
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy
    x, y = x0, y0
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        safe = jnp.where(jnp.abs(radial) < 1e-9, 1e-9, radial)
        x = (x0 - dx) / safe
        y = (y0 - dy) / safe
    u = fx * x + cx
    v = fy * y + cy
    return jnp.stack([u, v], axis=-1)


def unproject_normalized(uv, K):
    """Pixel -> normalized camera ray (z=1 plane)."""
    x = (uv[..., 0] - K[0, 2]) / K[0, 0]
    y = (uv[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
