"""RoI feature extraction with exact `tf.image.crop_and_resize` semantics.

Replaces the reference's TF fused kernel (`object_detection/model/
roi_pooling.py:79` et al.) with a TPU-native separable-matmul formulation:
bilinear resampling along y and x are linear maps, so each crop is
`W_y @ feature @ W_x^T` — two batched matmuls that run on the MXU instead of
a gather-heavy kernel. Gradients to the feature map fall out of autodiff
(boxes are stop-gradient, matching roi_pooling.py:80).

Two box-normalization variants exist in the reference and both are
reproduced exactly:
- `roi_crop_faster_rcnn`: rois/stride then normalize by (feat_h-1, feat_w-1)
  (`RoiPoolingCropAndResize`, roi_pooling.py:45-90); optional crop at 2x then
  2x2/stride-2 same-padding max pool.
- `roi_crop_fpn`: normalize by the *image* (h, w) (`RoiPoolingCropAndResize2`,
  roi_pooling.py:8-42); always crop at 2x then max pool.

TF crop_and_resize sampling rule (crop size S > 1):
  y_i = y1*(H-1) + i * (y2-y1)*(H-1)/(S-1), bilinear, whole sample = 0 when
  y_i outside [0, H-1] (same for x).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "crop_and_resize",
    "roi_crop_faster_rcnn",
    "roi_crop_fpn",
    "roi_align_fpcoor",
    "max_pool_2x2_same",
]


_EDGE_EPS = 1e-3  # see _interp_weights


def _interp_weights(lo: jnp.ndarray, hi: jnp.ndarray, size: int, crop: int) -> jnp.ndarray:
    """Bilinear sampling weights [N, crop, size] for TF crop_and_resize.

    lo/hi: [N] normalized start/end coords for each roi along this axis.
    """
    scale = jnp.asarray(size - 1, jnp.float32)
    if crop > 1:
        step = (hi - lo) * scale / (crop - 1)  # [N]
        coords = lo[:, None] * scale + step[:, None] * jnp.arange(
            crop, dtype=jnp.float32
        )[None, :]  # [N, crop]
    else:
        coords = (0.5 * (lo + hi) * scale)[:, None]
    # epsilon-tolerant bounds: under jit XLA may reassociate the coordinate
    # arithmetic (e.g. cancel /(crop-1)*(crop-1)) so an exact-edge sample
    # lands at scale+1e-5 and would be wrongly zeroed (worst-case
    # disagreement with TF: 1e-3 px at a box edge)
    in_range = (coords >= -_EDGE_EPS) & (coords <= scale + _EDGE_EPS)
    coords = jnp.clip(coords, 0.0, scale)
    cells = jnp.arange(size, dtype=jnp.float32)[None, None, :]  # [1, 1, size]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, :, None] - cells))  # tent
    return jnp.where(in_range[:, :, None], w, 0.0)


# Feature-cell count above which the 4-corner gather replaces the
# separable-matmul formulation. Measured on v5e: the matmul path wins even at
# FPN P2 size (160x256x256, despite its [N, S, W, C] intermediate) because
# TPU gathers serialize; the gather path is kept for pathological maps and
# as a memory fallback.
_GATHER_MIN_CELLS = 1_000_000


def _sample_coords(lo, hi, size: int, crop: int):
    """TF crop_and_resize sample coordinates [N, crop] + in-range mask."""
    scale = jnp.asarray(size - 1, jnp.float32)
    if crop > 1:
        step = (hi - lo) * scale / (crop - 1)
        coords = lo[:, None] * scale + step[:, None] * jnp.arange(
            crop, dtype=jnp.float32
        )[None, :]
    else:
        coords = (0.5 * (lo + hi) * scale)[:, None]
    ok = (coords >= -_EDGE_EPS) & (coords <= scale + _EDGE_EPS)
    return jnp.clip(coords, 0.0, scale), ok


def _crop_gather(features: jnp.ndarray, boxes: jnp.ndarray, crop_size: int):
    """Gather-based bilinear crop (identical semantics to the matmul path)."""
    h, w, c = features.shape
    ys, y_ok = _sample_coords(boxes[:, 0], boxes[:, 2], h, crop_size)  # [N,S]
    xs, x_ok = _sample_coords(boxes[:, 1], boxes[:, 3], w, crop_size)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, :, None, None]  # [N,S,1,1]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[:, None, :, None]  # [N,1,S,1]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    flat = features.reshape(h * w, c)

    def take(yi, xi):
        idx = yi[:, :, None] * w + xi[:, None, :]  # [N, S, S]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,)
        )

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    top = v00 * (1.0 - fx) + v01 * fx
    bot = v10 * (1.0 - fx) + v11 * fx
    out = top * (1.0 - fy) + bot * fy
    ok = (y_ok[:, :, None] & x_ok[:, None, :])[..., None]
    return jnp.where(ok, out.astype(jnp.float32), 0.0)


@functools.partial(jax.jit, static_argnames=("crop_size", "order"))
def crop_and_resize(
    features: jnp.ndarray, boxes: jnp.ndarray, crop_size: int,
    order: str = "h_first",
) -> jnp.ndarray:
    """TF-semantics crop_and_resize from a single feature map.

    Args:
      features: [H, W, C].
      boxes: [N, 4] normalized (y1, x1, y2, x2), TF box order.
      crop_size: static output resolution S.
      order: 'h_first' contracts H first (intermediate keeps W);
        'w_first' contracts W first (intermediate keeps H);
        'large_first' contracts whichever spatial axis is larger, so the
        intermediate keeps the smaller one (shape-resolved here, per
        map). Same math, different float-summation order and very
        different XLA layouts: at the Faster R-CNN C4 shapes
        ([38, 63, 1024] map, 128 rois, crop 14) the h_first [N, S, W, C]
        intermediate is 1.85 GB/step at b8-bf16 and its layout copies
        cost ~6 ms/step; keeping the smaller axis measured +6.3%% there —
        but at b1-f32 it REGRESSES 17%%, so the caller picks per compute
        dtype (BENCHLOG round 3 'contraction order' entry).

    Returns: [N, S, S, C] float32.

    Small maps use the separable-matmul formulation (MXU); large maps (FPN
    P2/P3) use a 4-corner gather to avoid the [N, S, W, C] intermediate.
    """
    h, w, c = features.shape
    if h * w > _GATHER_MIN_CELLS:
        return _crop_gather(features, boxes, crop_size)
    n = boxes.shape[0]
    wy = _interp_weights(boxes[:, 0], boxes[:, 2], h, crop_size)  # [N, S, H]
    wx = _interp_weights(boxes[:, 1], boxes[:, 3], w, crop_size)  # [N, S, W]
    if order not in ("h_first", "w_first", "large_first"):
        raise ValueError(f"unknown contraction order {order!r}")
    if order == "large_first":
        order = "w_first" if w > h else "h_first"
    if order == "w_first":
        featT = jnp.swapaxes(features, 0, 1).reshape(w, h * c)  # [W, H*C]
        cols = jnp.einsum(
            "ntw,wk->ntk", wx, featT, preferred_element_type=jnp.float32
        ).reshape(n, crop_size, h, c)
        return jnp.einsum(
            "nsh,nthc->nstc", wy, cols, preferred_element_type=jnp.float32
        )
    feat = features.reshape(h, w * c)
    # [N*S, H] @ [H, W*C] — one large MXU matmul.
    rows = jnp.einsum(
        "nsh,hk->nsk", wy, feat, preferred_element_type=jnp.float32
    ).reshape(n, crop_size, w, c)
    out = jnp.einsum(
        "ntw,nswc->nstc", wx, rows, preferred_element_type=jnp.float32
    )
    return out


def max_pool_2x2_same(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool with 'same' padding over [..., H, W, C]."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    )


def roi_crop_faster_rcnn(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    extractor_stride: int,
    pool_size: int,
    max_pooling: bool,
    order: str = "h_first",
) -> jnp.ndarray:
    """Faster R-CNN RoI pooling (`RoiPoolingCropAndResize`, roi_pooling.py:45-90).

    features: [H', W', C] (batch dim squeezed); rois: [N, 4] xyxy pixels.
    rois are divided by stride and normalized by (H'-1, W'-1).
    """
    h, w = features.shape[0], features.shape[1]
    r = jax.lax.stop_gradient(rois) / float(extractor_stride)
    boxes = jnp.stack(
        [
            r[:, 1] / (h - 1.0),
            r[:, 0] / (w - 1.0),
            r[:, 3] / (h - 1.0),
            r[:, 2] / (w - 1.0),
        ],
        axis=1,
    )
    if max_pooling:
        crops = crop_and_resize(features, boxes, pool_size * 2, order=order)
        return max_pool_2x2_same(crops)
    return crop_and_resize(features, boxes, pool_size, order=order)


def roi_align_fpcoor(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    extractor_stride: int,
    pool_size: int,
) -> jnp.ndarray:
    """Tensorpack-style RoIAlign (`RoiPoolingRoiAlign` + fpcoor
    `crop_and_resize` + avg-pool, roi_pooling.py:93-177).

    Floating-point-coordinate boxes: symmetric 1-px border pad, the fpcoor ->
    crop_and_resize transform (sample centers at x0 + spacing*(i+0.5) - 0.5),
    2x sampling then 2x2 average pool. features: [H', W', C]; rois: [N, 4]
    xyxy pixels on the input image.
    """
    r = jax.lax.stop_gradient(rois) / float(extractor_stride)
    # symmetric border pad (roi_pooling.py:100-103); boxes shift by +1
    padded = jnp.pad(features, ((1, 1), (1, 1), (0, 0)), mode="symmetric")
    h, w = padded.shape[0], padded.shape[1]
    x0, y0, x1, y1 = r[:, 0] + 1.0, r[:, 1] + 1.0, r[:, 2] + 1.0, r[:, 3] + 1.0

    crop = pool_size * 2
    spacing_w = (x1 - x0) / crop
    spacing_h = (y1 - y0) / crop
    nx0 = (x0 + spacing_w / 2 - 0.5) / (w - 1.0)
    ny0 = (y0 + spacing_h / 2 - 0.5) / (h - 1.0)
    nw = spacing_w * (crop - 1.0) / (w - 1.0)
    nh = spacing_h * (crop - 1.0) / (h - 1.0)
    boxes = jnp.stack([ny0, nx0, ny0 + nh, nx0 + nw], axis=1)
    crops = crop_and_resize(padded, boxes, crop)
    return jax.lax.reduce_window(
        crops,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="SAME",
    ) / 4.0


def roi_crop_fpn(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    image_height,
    image_width,
    pool_size: int,
    level_stride: int | None = None,
    order: str = "h_first",
) -> jnp.ndarray:
    """FPN RoI pooling (`RoiPoolingCropAndResize2`, roi_pooling.py:8-42).

    Normalizes rois by the *image* shape (may be traced per-image valid h/w),
    crops at 2x pool_size, then 2x2 same max pool.

    `level_stride` handles bucket padding: the reference runs on UNPADDED
    feature maps of valid extent ceil(image_dim / stride), so its sample
    coordinate is (y / image_h) * (valid_h - 1). Our feature map is the
    padded bucket grid of extent Hp >= valid_h, and crop_and_resize maps
    normalized coords onto (Hp - 1) — so the normalized boxes must be
    rescaled by (valid - 1) / (Hp - 1) per axis or samples stretch into the
    zero-padding whenever the image does not fill the bucket. Pass the
    pyramid level's stride to enable this (correct) behavior; None keeps the
    raw image-shape normalization, valid only when the map is unpadded.
    Out-of-valid-extent samples are not re-zeroed here: proposals are always
    clipped to the image beforehand, which already bounds coords < valid - 1.
    """
    r = jax.lax.stop_gradient(rois)
    ih = jnp.asarray(image_height, jnp.float32)
    iw = jnp.asarray(image_width, jnp.float32)
    if level_stride is None:
        fy = 1.0 / ih
        fx = 1.0 / iw
    else:
        s = float(level_stride)
        vh = jnp.ceil(ih / s)  # valid grid cells: iterated same-pad stride-2
        vw = jnp.ceil(iw / s)
        h, w = features.shape[0], features.shape[1]
        fy = (vh - 1.0) / ((h - 1.0) * ih)
        fx = (vw - 1.0) / ((w - 1.0) * iw)
    boxes = jnp.stack(
        [r[:, 1] * fy, r[:, 0] * fx, r[:, 3] * fy, r[:, 2] * fx], axis=1
    )
    crops = crop_and_resize(features, boxes, pool_size * 2, order=order)
    return max_pool_2x2_same(crops)
