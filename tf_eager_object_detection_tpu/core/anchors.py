"""Anchor generation (both parameterizations used by the reference).

- `generate_anchor_base` + `shift_anchor_base`: py-faster-rcnn style base
  anchors (with rounding) shifted over the feature grid; used by Faster R-CNN
  (reference: `object_detection/utils/anchor_generator.py:63-134` and
  `generate_by_anchor_base_tf` :49-60, xyxy shift order).
- `make_level_anchors`: FPN_Tensorflow style `make_anchors`
  (anchor_generator.py:137-178): base_size*scale square split by sqrt-ratio,
  centers at (x*stride, y*stride), no rounding, no +1 convention.

TPU-first deltas vs the reference: anchors are generated once for the *padded*
static grid (grid_h x grid_w known at trace time) and returned together with
helpers to compute a validity mask for the dynamically-valid sub-grid
(ceil(h/stride) x ceil(w/stride)), so every downstream shape stays static.

Ordering contract (must match the RPN head reshape): cell-major (row-major
over (y, x)), anchor-minor — anchors[(y * grid_w + x) * A + a].
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "generate_anchor_base",
    "shift_anchor_base",
    "make_level_anchors",
    "valid_anchor_mask",
]


def _whctrs(anchor):
    w = anchor[2] - anchor[0] + 1
    h = anchor[3] - anchor[1] + 1
    x_ctr = anchor[0] + 0.5 * (w - 1)
    y_ctr = anchor[1] + 0.5 * (h - 1)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws, hs, x_ctr, y_ctr):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1),
            y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1),
            y_ctr + 0.5 * (hs - 1),
        )
    )


def generate_anchor_base(base_size=16, ratios=(0.5, 1.0, 2.0), scales=(8, 16, 32)):
    """Base anchors around a (0,0,base_size-1,base_size-1) window, numpy.

    Enumeration order: ratio-major, scale-minor (same as the reference /
    py-faster-rcnn `generate_anchors`). Returns [A, 4] float64 xyxy.
    """
    ratios = np.asarray(ratios, np.float64)
    scales = np.asarray(scales, np.float64)
    base_anchor = np.array([1, 1, base_size, base_size], np.float64) - 1
    w, h, x_ctr, y_ctr = _whctrs(base_anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)
    out = []
    for i in range(ratio_anchors.shape[0]):
        w, h, x_ctr, y_ctr = _whctrs(ratio_anchors[i, :])
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    return np.vstack(out)


def shift_anchor_base(anchor_base: np.ndarray, feat_stride: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Shift base anchors over a grid_h x grid_w grid -> [grid_h*grid_w*A, 4].

    Shift order is xyxy (matches `generate_by_anchor_base_tf`,
    anchor_generator.py:49-60). Static python ints for the grid; numpy output
    (anchors are constants folded into the jitted program).
    """
    shift_x = np.arange(grid_w, dtype=np.float32) * feat_stride
    shift_y = np.arange(grid_h, dtype=np.float32) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)  # [grid_h, grid_w]
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    a = anchor_base.shape[0]
    k = shifts.shape[0]
    anchors = anchor_base.reshape((1, a, 4)).astype(np.float32) + shifts.reshape(
        (k, 1, 4)
    )
    return anchors.reshape((k * a, 4)).astype(np.float32)


def make_level_anchors(
    base_anchor_size: float,
    scales,
    ratios,
    grid_h: int,
    grid_w: int,
    stride: int,
) -> np.ndarray:
    """FPN-style anchors for one level -> [grid_h*grid_w*A, 4] float32 xyxy.

    Matches `make_anchors` (anchor_generator.py:137-178) exactly, including
    the `enum_ratios` return-value swap (:178 returns `(hs, ws)` which
    make_anchors unpacks as `ws, hs`): per (ratio, scale) the emitted box is
    w = base*scale*sqrt(ratio), h = base*scale/sqrt(ratio), centered at
    (x*stride, y*stride). Anchor order within a cell: RATIO-major,
    scale-minor. Proven against the reference's executing `make_anchors` in
    tests/test_reference_oracle.py (the set is ratio-symmetric, but the
    per-index mapping matters for FPN_Tensorflow weight import).
    """
    scales = np.asarray(scales, np.float32)
    ratios = np.asarray(ratios, np.float32)
    sizes = base_anchor_size * scales  # [S]
    sqrt_r = np.sqrt(ratios)  # [R]
    ws = (sqrt_r[:, None] * sizes[None, :]).ravel()  # [R*S], ratio-major
    hs = (sizes[None, :] / sqrt_r[:, None]).ravel()

    x_centers = np.arange(grid_w, dtype=np.float32) * stride
    y_centers = np.arange(grid_h, dtype=np.float32) * stride
    xc, yc = np.meshgrid(x_centers, y_centers)  # [grid_h, grid_w]
    xc = xc.ravel()[:, None]  # [K, 1]
    yc = yc.ravel()[:, None]
    ws = ws[None, :]  # [1, A]
    hs = hs[None, :]
    anchors = np.stack(
        [xc - 0.5 * ws, yc - 0.5 * hs, xc + 0.5 * ws, yc + 0.5 * hs], axis=2
    )  # [K, A, 4]
    return anchors.reshape(-1, 4).astype(np.float32)


def valid_anchor_mask(grid_h: int, grid_w: int, num_anchors: int, valid_h, valid_w):
    """[grid_h*grid_w*num_anchors] bool: anchors whose grid cell is inside the
    dynamically-valid sub-grid (ceil(image_h/stride) = valid_h rows etc.).

    This masks out anchors that the reference (which builds anchors only for
    the valid grid) would never create; scores at these positions are forced
    to -inf upstream of top-k/NMS so padded-image positions never win.
    `valid_h`/`valid_w` may be traced ints.
    """
    ys = jnp.arange(grid_h)[:, None]  # [H,1]
    xs = jnp.arange(grid_w)[None, :]  # [1,W]
    cell_ok = (ys < valid_h) & (xs < valid_w)  # [H,W]
    # broadcast + reshape instead of jnp.repeat: repeat lowers to a gather
    # that cost ~1 ms/step on the FPN 163k-anchor path (trace fusion.1)
    return jnp.broadcast_to(
        cell_ok[:, :, None], (grid_h, grid_w, num_anchors)
    ).reshape(-1)
