"""Rotation conversions and rigid alignment (JAX, batched, jit-safe).

Capability parity with the reference rotation/geometry core
(reference: utils/geometry.py:7-281 — quaternion/axis-angle/matrix conversions
and Kabsch alignment), re-written as branch-free, fully batched jnp code so it
can live inside ``jit``/``vmap``/``lax.scan`` on TPU.  All functions accept
arbitrary leading batch dimensions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# Geometry matmuls (3x3 rotations, Kabsch covariances) are tiny but precision-
# critical: poses accumulate over 20 diffusion steps.  XLA's default matmul
# precision is bf16-class on TPU, so force full fp32 here.  Model-layer
# matmuls elsewhere keep the fast default — that is where the FLOPs are.
PRECISE = jax.lax.Precision.HIGHEST


def pmm(a: Array, b: Array) -> Array:
    """Full-precision matmul for geometry-critical contractions."""
    return jnp.matmul(a, b, precision=PRECISE)


def quaternion_to_matrix(q: Array) -> Array:
    """Unit-norm-insensitive quaternion (w, x, y, z) -> rotation matrix (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(q, -1, 0)
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quaternion(axis_angle: Array) -> Array:
    """Rotation vector (..., 3) -> quaternion (w, x, y, z).

    Uses a Taylor expansion of sin(x/2)/x near zero so the map is smooth and
    differentiable at the identity (needed inside the jitted samplers, where a
    zero update must be exactly the identity rotation).
    """
    sumsq = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)
    small = sumsq < 1e-12
    # double-where: the norm (sqrt) must never see 0, or its NaN gradient
    # leaks through the untaken branch under autodiff
    safe_angles = jnp.sqrt(jnp.where(small, 1.0, sumsq))
    half = 0.5 * safe_angles
    sin_half_over_angle = jnp.where(
        small, 0.5 - sumsq / 48.0, jnp.sin(half) / safe_angles
    )
    cos_half = jnp.where(small, 1.0 - sumsq / 8.0, jnp.cos(half))
    return jnp.concatenate([cos_half, axis_angle * sin_half_over_angle], axis=-1)


def axis_angle_to_matrix(axis_angle: Array) -> Array:
    """Rotation vector (..., 3) -> rotation matrix (..., 3, 3)."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def _sqrt_positive_part(x: Array) -> Array:
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: Array) -> Array:
    """Rotation matrix (..., 3, 3) -> quaternion (w, x, y, z), branch-free.

    Selects the numerically best of the four candidate quaternions (one per
    component with the largest magnitude) with a one-hot ``where`` instead of
    data-dependent control flow.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )  # (..., 4, 4)

    flr = jnp.asarray(0.1, dtype=matrix.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))

    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=matrix.dtype)
    q = jnp.sum(quat_candidates * onehot[..., None], axis=-2)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quaternion_to_axis_angle(q: Array) -> Array:
    """Quaternion (w, x, y, z) -> rotation vector (..., 3), smooth at identity."""
    norms = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, q[..., :1])
    angles = 2.0 * half_angles
    small = jnp.abs(angles) < 1e-6
    sin_half_over_angle = jnp.where(
        small,
        0.5 - (angles * angles) / 48.0,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return q[..., 1:] / sin_half_over_angle


def matrix_to_axis_angle(matrix: Array) -> Array:
    """Rotation matrix (..., 3, 3) -> rotation vector (..., 3)."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def kabsch(
    a: Array, b: Array, weights: Array | None = None
) -> tuple[Array, Array]:
    """Weighted rigid alignment of point set ``a`` (..., N, 3) onto ``b`` (..., N, 3).

    Returns ``(R, t)`` with ``a @ R.T + t ~= b`` in the least-squares sense.
    ``weights`` (..., N) supports masked/padded point sets: padded rows get
    weight 0 and do not influence the alignment.  Reflections are corrected by
    flipping the smallest singular vector (det(R) = +1 always).

    TPU note: the 3x3 SVD vmaps/compiles fine; the per-sample cost is
    negligible next to the GNN forward.
    """
    if weights is None:
        weights = jnp.ones(a.shape[:-1], dtype=a.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    centroid_a = jnp.sum(a * w, axis=-2, keepdims=True) / wsum
    centroid_b = jnp.sum(b * w, axis=-2, keepdims=True) / wsum
    am = (a - centroid_a) * w
    bm = b - centroid_b
    h = pmm(jnp.swapaxes(am, -1, -2), bm)  # (..., 3, 3)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(pmm(jnp.swapaxes(vt, -1, -2), jnp.swapaxes(u, -1, -2)))
    flip = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # (..., 3)
    r = pmm(jnp.swapaxes(vt, -1, -2), flip[..., :, None] * jnp.swapaxes(u, -1, -2))
    t = centroid_b - pmm(centroid_a, jnp.swapaxes(r, -1, -2))
    return r, t[..., 0, :]


def kabsch_independent(a: Array, b: Array, weights: Array | None = None):
    """Kabsch variant returning the translation and rotation *separately*
    (translation is centroid difference only, not coupled to R).

    Used by the SVGD particle-interaction kernel (reference:
    utils/geometry.py:246-281 ``rigid_transform_Kabsch_independent_torch``).
    Returns ``(t, rot_vec)``.
    """
    if weights is None:
        weights = jnp.ones(a.shape[:-1], dtype=a.dtype)
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-12)
    centroid_a = jnp.sum(a * w, axis=-2, keepdims=True) / wsum
    centroid_b = jnp.sum(b * w, axis=-2, keepdims=True) / wsum
    r, _ = kabsch(a, b, weights)
    t = (centroid_b - centroid_a)[..., 0, :]
    return t, matrix_to_axis_angle(r)


def rotate_about_point(pos: Array, rot_mat: Array, pivot: Array) -> Array:
    """Rotate points (..., N, 3) about ``pivot`` (..., 3) by ``rot_mat`` (..., 3, 3)."""
    return pmm(pos - pivot[..., None, :], jnp.swapaxes(rot_mat, -1, -2)) + pivot[..., None, :]


def uniform_rotation(key: jax.Array, batch_shape=()) -> Array:
    """Uniform random rotation matrices via normalized Gaussian quaternions."""
    q = jax.random.normal(key, batch_shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)
