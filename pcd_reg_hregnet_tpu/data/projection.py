"""Camera projection utilities: pcd -> image uv, batched depth images.

TPU-native re-design of the reference's projection stack:
`PointCloudProjection` (`/root/reference/dataset/dataset_utils.py:28-97`),
`PointCloud180degFilter` (`dataset_utils.py:225-270`), and the batched
`DepthImgGenerator` (`transform/dataset_transforms.py:204-261`).

The host-side helpers are numpy (they run in the data pipeline); the
batched depth-image renderer is jittable: the reference's per-batch-item
boolean-mask loop becomes one static-shape scatter — invalid points are
routed to a scratch pixel that is sliced away, so the whole batch renders
in a single XLA op with no dynamic shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import se3


def project_to_image(img_shape: Tuple[int, int], intrinsic: np.ndarray,
                     pcd: np.ndarray, range_arr: np.ndarray):
    """Project points [N, 3] through a 3x3 intrinsic onto an (H, W) image.

    Returns (u, v, r, valid): integer pixel coords and ranges of the valid
    (in-bounds, positive-depth) points, plus the full-length valid mask —
    the `pcd_projection` contract (`dataset_utils.py:30-68`).
    """
    H, W = img_shape
    proj = pcd @ np.asarray(intrinsic).T               # [N, 3]
    with np.errstate(divide='ignore', invalid='ignore'):
        u = (proj[:, 0] / proj[:, 2]).astype(np.int64)
        v = (proj[:, 1] / proj[:, 2]).astype(np.int64)
    valid = (0 <= u) & (u < W) & (0 <= v) & (v < H) & (proj[:, 2] > 0)
    return u[valid], v[valid], np.asarray(range_arr)[valid], valid


def binary_projection(img_shape: Tuple[int, int], intrinsic: np.ndarray,
                      pcd: np.ndarray):
    """Like `project_to_image` but returns unfiltered (u, v, valid)
    (`dataset_utils.py:70-97`)."""
    H, W = img_shape
    proj = pcd @ np.asarray(intrinsic).T
    with np.errstate(divide='ignore', invalid='ignore'):
        u = (proj[:, 0] / proj[:, 2]).astype(np.int64)
        v = (proj[:, 1] / proj[:, 2]).astype(np.int64)
    valid = (0 <= u) & (u < W) & (0 <= v) & (v < H) & (proj[:, 2] > 0)
    return u, v, valid


def azimuth_filter(points: np.ndarray, min_deg: float = -130.0,
                   max_deg: float = 50.0) -> np.ndarray:
    """Keep points whose xy azimuth lies in [min_deg, max_deg]
    (`PointCloud180degFilter`, `dataset_utils.py:225-270`; the reference
    hard-codes -130..50 for the forward camera sector)."""
    theta = np.degrees(np.arctan2(points[:, 1], points[:, 0]))
    return points[(theta >= min_deg) & (theta <= max_deg)]


def render_depth_images(extrinsic: jnp.ndarray, pcd: jnp.ndarray,
                        intrinsic: jnp.ndarray, img_shape: Tuple[int, int],
                        pcd_range: jnp.ndarray, intensity: jnp.ndarray,
                        density: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched pcd -> 3-channel (range, intensity, density) depth images.

    Jittable equivalent of `DepthImgGenerator.transform`
    (`dataset_transforms.py:217-247`): transform [B, N, 3] points by
    [B, 4, 4] extrinsics, project through the intrinsic, and scatter the
    per-point channels into [B, 3, H, W].  Invalid points scatter into a
    scratch pixel appended past H*W (static shapes, no boolean indexing).

    Returns (depth_img [B, 3, H, W], transformed_pcd [B, N, 3]).
    """
    H, W = img_shape
    p = se3.transform(extrinsic, pcd)                    # [B, N, 3]
    proj = jnp.einsum('ij,bnj->bni', intrinsic, p)
    w = proj[..., 2]
    # truncation toward zero, matching the host helpers and the reference's
    # `.type(torch.long)` (`dataset_transforms.py:232-233`)
    u = (proj[..., 0] / w).astype(jnp.int32)
    v = (proj[..., 1] / w).astype(jnp.int32)
    valid = (0 <= u) & (u < W) & (0 <= v) & (v < H) & (w > 0)
    flat = jnp.where(valid, v * W + u, H * W)            # scratch pixel H*W

    values = jnp.stack([pcd_range, intensity, density], axis=-1)  # [B,N,3]

    def scatter_one(idx, vals):
        img = jnp.zeros((H * W + 1, 3), vals.dtype)
        return img.at[idx].set(vals)[: H * W]

    imgs = jax.vmap(scatter_one)(flat, values)           # [B, H*W, 3]
    return jnp.moveaxis(imgs.reshape(-1, H, W, 3), -1, 1), p


class DepthImageRenderer:
    """Stateful wrapper matching the reference's `DepthImgGenerator` ctor
    shape (img_shape + intrinsic + per-batch channels bound once, extrinsic
    varying per call)."""

    def __init__(self, img_shape: Tuple[int, int], intrinsic: jnp.ndarray,
                 pcd_range: jnp.ndarray, intensity: jnp.ndarray,
                 density: jnp.ndarray):
        K = jnp.eye(3, dtype=jnp.float32)
        intrinsic = jnp.asarray(intrinsic, jnp.float32)
        K = K.at[: intrinsic.shape[0], : intrinsic.shape[1]].set(
            intrinsic[:3, :3])
        self.img_shape = tuple(img_shape)
        self.intrinsic = K
        self.pcd_range = pcd_range
        self.intensity = intensity
        self.density = density

    def __call__(self, extrinsic: jnp.ndarray, pcd: jnp.ndarray):
        return render_depth_images(extrinsic, pcd, self.intrinsic,
                                   self.img_shape, self.pcd_range,
                                   self.intensity, self.density)
