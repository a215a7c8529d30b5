"""SE(2) Lie-group operations on ``[..., 3]`` pose tensors.

Capability parity with GTSAM's ``Pose2``/``Rot2`` (SURVEY.md §3.2 "Geometry /
Lie groups"): compose, inverse, between, expmap/logmap, adjoint, point
transforms, and the analytic Jacobians the factor-graph layer needs. Unlike
GTSAM's one-object-per-pose C++ classes, everything here is vectorized over
arbitrary leading batch axes — a pose is the array ``[x, y, theta]`` and a
million poses are a ``[1_000_000, 3]`` tensor. All functions are pure, jit-
and vmap-compatible, and dtype-polymorphic (f32 fast path, f64 test oracle).

Conventions
-----------
- ``R(theta) = [[c, -s], [s, c]]`` (CCW).
- ``compose(a, b)``: first apply ``b`` in ``a``'s frame — ``t = t_a + R_a t_b``,
  ``theta = theta_a + theta_b`` (matches GTSAM Pose2 composition semantics).
- Tangent vectors are ``[vx, vy, omega]`` with the standard SE(2) exponential
  (constant twist integration).
- ``wrap`` maps angles to ``(-pi, pi]`` — used anywhere raw angle differences
  appear (the additive-coordinates factor parametrization in ndtpu.graph).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "wrap",
    "rotmat",
    "compose",
    "inverse",
    "between",
    "transform",
    "transform_inv",
    "expmap",
    "logmap",
    "adjoint",
    "retract",
]


def wrap(theta):
    """Wrap angles to the interval (-pi, pi]. Shape-preserving."""
    pi = jnp.asarray(jnp.pi, dtype=theta.dtype if hasattr(theta, "dtype") else None)
    return theta - 2.0 * jnp.pi * jnp.floor((theta + jnp.pi) / (2.0 * jnp.pi))


def rotmat(theta):
    """Rotation matrices ``[..., 2, 2]`` for angles ``[...]``."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a, b):
    """Pose composition ``a * b`` for ``[..., 3]`` pose tensors."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    t = wrap(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, t], axis=-1)


def inverse(a):
    """Pose inverse for ``[..., 3]`` pose tensors."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, wrap(-a[..., 2])], axis=-1)


def between(a, b):
    """Relative pose ``a^{-1} * b`` (GTSAM ``between`` semantics)."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    return jnp.stack([x, y, wrap(b[..., 2] - a[..., 2])], axis=-1)


def transform(pose, points):
    """Transform local points to the world frame: ``R(theta) p + t``.

    pose: ``[..., 3]``; points: ``[..., N, 2]`` (pose axes broadcast against
    the leading axes of points). Returns ``[..., N, 2]``.
    """
    c = jnp.cos(pose[..., 2])[..., None]
    s = jnp.sin(pose[..., 2])[..., None]
    px, py = points[..., 0], points[..., 1]
    x = c * px - s * py + pose[..., 0][..., None]
    y = s * px + c * py + pose[..., 1][..., None]
    return jnp.stack([x, y], axis=-1)


def transform_inv(pose, points):
    """Transform world points into the pose's local frame."""
    c = jnp.cos(pose[..., 2])[..., None]
    s = jnp.sin(pose[..., 2])[..., None]
    dx = points[..., 0] - pose[..., 0][..., None]
    dy = points[..., 1] - pose[..., 1][..., None]
    return jnp.stack([c * dx + s * dy, -s * dx + c * dy], axis=-1)


def _sinc(x):
    """sin(x)/x, safe at 0 (series to O(x^4))."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)  # avoid 0/0 in the non-taken branch
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x):
    """(1 - cos(x))/x, safe at 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, x / 2.0 - x**3 / 24.0, (1.0 - jnp.cos(xs)) / xs)


def expmap(xi):
    """SE(2) exponential map: twist ``[..., 3] = [vx, vy, omega]`` → pose.

    ``t = V(omega) v`` with ``V = [[sinc, -cosc], [cosc, sinc]]``.
    """
    v1, v2, w = xi[..., 0], xi[..., 1], xi[..., 2]
    sc, cc = _sinc(w), _cosc(w)
    x = sc * v1 - cc * v2
    y = cc * v1 + sc * v2
    return jnp.stack([x, y, wrap(w)], axis=-1)


def logmap(pose):
    """SE(2) logarithm map: pose → twist ``[..., 3]`` (inverse of expmap)."""
    x, y, w = pose[..., 0], pose[..., 1], wrap(pose[..., 2])
    sc, cc = _sinc(w), _cosc(w)
    den = sc * sc + cc * cc  # = 2(1-cos w)/w^2, > 0, → 1 at w=0
    v1 = (sc * x + cc * y) / den
    v2 = (-cc * x + sc * y) / den
    return jnp.stack([v1, v2, w], axis=-1)


def adjoint(pose):
    """Adjoint matrices ``[..., 3, 3]`` mapping right-tangent to left-tangent."""
    c, s = jnp.cos(pose[..., 2]), jnp.sin(pose[..., 2])
    x, y = pose[..., 0], pose[..., 1]
    z = jnp.zeros_like(c)
    o = jnp.ones_like(c)
    row0 = jnp.stack([c, -s, y], axis=-1)
    row1 = jnp.stack([s, c, -x], axis=-1)
    row2 = jnp.stack([z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def retract(pose, delta):
    """Manifold update used by the optimizers: ``pose * exp(delta)``.

    GTSAM Pose2's default retraction is the exponential map; using the same
    retraction keeps factor Jacobian conventions aligned (SURVEY.md §3.2).
    """
    return compose(pose, expmap(delta))
