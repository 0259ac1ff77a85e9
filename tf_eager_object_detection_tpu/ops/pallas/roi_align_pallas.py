"""Pallas TPU kernel: windowed RoIAlign for large FPN feature maps.

Motivation (measured on v5e, BENCHLOG.md): the separable-matmul
crop_and_resize on an FPN P2 map (160x256x256) does ~147M MACs *per roi*
([S, H] @ [H, W*C]) plus a [N, S, W, C] HBM intermediate, and a gather
variant measured slower still (TPU gathers serialize). This kernel instead
DMAs a fixed 64-cell window around each roi from HBM into VMEM and
interpolates with two small MXU matmuls ([S, 64] @ [64, 64*C] then a
batched [S, 64] x [64, C]) — ~25x less compute and a constant working set.
Rois not assigned to this pyramid level (`active == 0`) skip the DMA and
the matmuls entirely and just write zeros, so a 4-level one-hot RoIAlign
pays for each roi's window exactly once across the pyramid.

Sampling semantics match `roi_crop_fpn` / TF `tf.image.crop_and_resize`
(reference: object_detection/model/roi_pooling.py:8-42) EXCEPT that sample
points farther than WINDOW-1 cells from the roi's min corner contribute
zero. FPN's level assignment (base_fpn_model.py:309-313) bounds assigned-roi
spans: level l gets sqrt(w*h) < 224 * 2^(l-3.5), i.e. <= 40 cells at that
level's stride for aspect ratios up to ~10, so the 64-cell window is exact
for everything but degenerate hyper-elongated proposals (opt-in via config
`tpu_roi_align_impl = 'pallas'`; the default einsum path has no such bound).

Batching: jax.vmap cannot batch a pallas_call that uses scalar prefetch +
manual DMA, so batch is folded into the row dimension instead — the [B, Hp,
Wp, C] pyramid level is viewed as one [B*Hp, Wp*C] plane and each roi's
window origin is offset by its image's row base (windows are clamped inside
their own image, so they never straddle two images).

Lowering notes: window origins are data-dependent, which BlockSpec index
maps cannot express (they are block-granular), so the window is fetched with
an explicit `pltpu.make_async_copy` from an ANY-space ref using
scalar-prefetched per-roi origins; all in-kernel math is 2D/batched-3D
matmul-and-broadcast only (no value-level dynamic slices — Mosaic won't
lower those, see nms_pallas.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_roi_align_window", "pallas_roi_align_multilevel", "WINDOW"]

WINDOW = 64  # default feature cells per side DMA'd for each roi


def _window_copy(
    feat_ref, sy8_ref, sxa_ref, j, win_ref, sem, c, lane_align, row_align,
    window,
):
    """The roi-j window DMA descriptor (must be identical at start and wait)."""
    return pltpu.make_async_copy(
        feat_ref.at[
            pl.ds(sy8_ref[j] * row_align, window),
            pl.ds(sxa_ref[j] * (lane_align * c), window * c),
        ],
        win_ref,
        sem,
    )


def _kernel(
    sy8_ref,
    sxa_ref,
    active_ref,
    coords_ref,
    feat_ref,
    out_ref,
    win0_ref,
    win1_ref,
    sem0,
    sem1,
    *,
    crop: int,
    c: int,
    lane_align: int,
    row_align: int,
    total: int,
    window: int,
):
    """One roi per grid step, double-buffered window DMA.

    sy8/sxa/active: scalar-prefetch [BN] int32 — window origin row / 8
    (including the image's row base) and origin col / lane_align, plus the
    level one-hot. Origins arrive pre-divided and are re-multiplied here so
    Mosaic can prove the DMA slice start is tile-aligned (it cannot prove
    divisibility of an opaque scalar). coords_ref: [1, 2, crop] VMEM
    absolute sample coords (y row incl. base; x). feat_ref: [B*Hp, Wp*C] in
    HBM. out_ref: [1, crop, crop*C] VMEM. win0/win1: [WINDOW, WINDOW*C] VMEM
    scratch ping-pong buffers (roi j uses buffer j % 2); sem0/sem1: their DMA
    semaphores.

    Pipeline: grid step i waits for the copy issued at step i-1 (or its own
    prologue copy at i == 0) into buffer i % 2, and starts roi i+1's copy
    into buffer (i+1) % 2 — whose previous user, roi i-1, already finished —
    so the next window streams in while this roi interpolates.
    """
    i = pl.program_id(0)
    sy = sy8_ref[i] * row_align
    sx = sxa_ref[i] * lane_align

    @pl.when(jnp.logical_and(i == 0, active_ref[i] != 0))
    def _prologue():
        _window_copy(feat_ref, sy8_ref, sxa_ref, i, win0_ref, sem0, c, lane_align, row_align, window).start()

    nxt = jnp.minimum(i + 1, total - 1)  # clamped: only read under the guard
    start_next = jnp.logical_and(i + 1 < total, active_ref[nxt] != 0)

    @pl.when(jnp.logical_and(start_next, (i + 1) % 2 == 0))
    def _start_next_even():
        _window_copy(feat_ref, sy8_ref, sxa_ref, nxt, win0_ref, sem0, c, lane_align, row_align, window).start()

    @pl.when(jnp.logical_and(start_next, (i + 1) % 2 == 1))
    def _start_next_odd():
        _window_copy(feat_ref, sy8_ref, sxa_ref, nxt, win1_ref, sem1, c, lane_align, row_align, window).start()

    @pl.when(active_ref[i] == 0)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def _interpolate(win_ref):
        ys = coords_ref[0, 0:1, :] - sy.astype(jnp.float32)  # [1, crop]
        xs = coords_ref[0, 1:2, :] - sx.astype(jnp.float32)
        # Mosaic only lowers integer iota
        cells = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1).astype(
            jnp.float32
        )
        # tent weights [crop, window]; out-of-window samples get zero rows
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.transpose(ys) - cells))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.transpose(xs) - cells))

        win = win_ref[:, :]
        # Mosaic's default matmul contract precision is the MXU-native bf16
        # multiply even for f32 operands (measured ~6e-3 relative error);
        # f32 windows must request full fp32 contraction to stay exact vs
        # the einsum path. bf16 windows keep the native precision (that IS
        # their traffic/accuracy trade).
        win_prec = (
            None if win.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        rows = jnp.dot(
            wy.astype(win.dtype),
            win,
            preferred_element_type=jnp.float32,
            precision=win_prec,
        )  # [crop, window*C], y-interpolation done
        rows3 = rows.reshape(crop, window, c)
        # x-interpolation as a batched matmul over the crop rows:
        # for each y: [crop, window] @ [window, C] -> [crop, C]
        wxb = jnp.broadcast_to(wx[None], (crop, crop, window))
        out = jax.lax.dot_general(
            wxb,
            rows3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [y, x, C]
        out_ref[0] = out.reshape(crop, crop * c)

    @pl.when(jnp.logical_and(active_ref[i] != 0, i % 2 == 0))
    def _compute_even():
        _window_copy(feat_ref, sy8_ref, sxa_ref, i, win0_ref, sem0, c, lane_align, row_align, window).wait()
        _interpolate(win0_ref)

    @pl.when(jnp.logical_and(active_ref[i] != 0, i % 2 == 1))
    def _compute_odd():
        _window_copy(feat_ref, sy8_ref, sxa_ref, i, win1_ref, sem1, c, lane_align, row_align, window).wait()
        _interpolate(win1_ref)


def _bwd_kernel(
    sy8_ref,
    sxa_ref,
    active_ref,
    coords_ref,
    g_ref,
    dfin_ref,
    df_ref,
    win_ref,
    sem,
    *,
    crop: int,
    c: int,
    lane_align: int,
    row_align: int,
    window: int,
):
    """VJP-w.r.t.-features of the windowed forward: one roi per grid step,
    read-modify-write of the roi's window in the df plane (grid steps are
    sequential on a TPU core, so overlapping roi windows accumulate without
    atomics). dfin_ref is the zero-initialized plane aliased onto df_ref
    (input_output_aliases); only df_ref is touched here.
    """
    del dfin_ref
    i = pl.program_id(0)
    sy = sy8_ref[i] * row_align
    sx = sxa_ref[i] * lane_align

    @pl.when(active_ref[i] != 0)
    def _accumulate():
        copy_in = _window_copy(
            df_ref, sy8_ref, sxa_ref, i, win_ref, sem, c, lane_align,
            row_align, window,
        )
        copy_in.start()
        copy_in.wait()

        ys = coords_ref[0, 0:1, :] - sy.astype(jnp.float32)  # [1, crop]
        xs = coords_ref[0, 1:2, :] - sx.astype(jnp.float32)
        cells = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).astype(
            jnp.float32
        )
        # transposed tent weights [window, crop]
        wyt = jnp.maximum(0.0, 1.0 - jnp.abs(cells - ys))
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(cells - xs))

        g2 = g_ref[0]  # [crop, crop*C]
        t1 = jnp.dot(
            wyt,
            g2,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [window, crop*C] — y-transpose done
        t13 = t1.reshape(window, crop, c)
        # x-transpose as a batched matmul over the window rows:
        # contrib[yc, xc, ch] = sum_x wxt[xc, x] * t13[yc, x, ch]
        wxb = jnp.broadcast_to(wxt[None], (window, window, crop))
        contrib = jax.lax.dot_general(
            wxb,
            t13,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [yc, xc, C]
        win_ref[:, :] = win_ref[:, :] + contrib.reshape(window, window * c)

        copy_out = pltpu.make_async_copy(
            win_ref,
            df_ref.at[
                pl.ds(sy8_ref[i] * row_align, window),
                pl.ds(sxa_ref[i] * (lane_align * c), window * c),
            ],
            sem,
        )
        copy_out.start()
        copy_out.wait()


def pallas_roi_align_window(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    active: jnp.ndarray,
    image_height,
    image_width,
    crop_size: int,
    interpret: bool = False,
    level_stride: int | None = None,
    window_dtype: jnp.dtype = jnp.float32,
    backward: str = "window",
    window: int = WINDOW,
) -> jnp.ndarray:
    """FPN-style RoIAlign (roi_crop_fpn sampling) via the windowed kernel.

    features: [B, H, W, C] (or [H, W, C]); rois: [B, N, 4] (or [N, 4]) xyxy
    pixels on the image; active: [B, N] bool/int — rois with active == 0
    return all-zero crops without touching HBM; image_height/width: [B] (or
    scalars), the per-image *valid* extent used for normalization.
    `level_stride`: when the map is a padded bucket grid, pass the pyramid
    level's stride so sample coords target the valid extent
    ceil(image_dim / stride) instead of the padded grid (see roi_crop_fpn).
    `window_dtype`: jnp.bfloat16 halves the per-roi window DMA traffic (the
    kernel's bottleneck); interpolation error vs the exact f32 path is
    bounded by bf16's ~2^-8 relative step on the feature values.
    `backward`: 'window' (default) scatter-adds each roi's window into the
    df plane with the same geometry as the forward — the exact VJP of the
    windowed sampling, with no [N, S, W, C] transposes; 'einsum' keeps the
    transpose-of-einsum backward (which also back-propagates the
    out-of-window contributions the windowed forward never computed).
    `window`: cells per side DMA'd per roi (default 64). FPN level
    assignment bounds an assigned roi's span to sqrt(wh) < 28 cells at its
    level, i.e. a 64-cell window is exact up to aspect ~5 and 40 covers
    aspect ~2 (the anchor ratios); smaller windows cut the kernel's DMA
    traffic quadratically and truncate only hyper-elongated proposals'
    outermost samples. Must be a multiple of 16.
    Returns [B, N, S, S, C] (or [N, S, S, C]) f32, S = crop_size.

    Differentiable in `features` (detection training backprops through
    RoIAlign into the pyramid): pallas_call has no jvp rule, so the kernel
    is wrapped in a custom_vjp whose backward is the transpose of the same
    bilinear sampling expressed as einsums (identical math to the einsum
    forward in ops/roi_align.py, which is golden-tested against TF).
    """
    single = features.ndim == 3
    if single:
        features = features[None]
        rois = rois[None]
        active = jnp.asarray(active)[None]
    b = features.shape[0]
    ih = jnp.broadcast_to(jnp.asarray(image_height, jnp.float32), (b,))
    iw = jnp.broadcast_to(jnp.asarray(image_width, jnp.float32), (b,))
    act = (jnp.asarray(active) != 0).astype(jnp.float32)
    if backward not in ("window", "einsum"):
        raise ValueError(f"unknown backward {backward!r}")
    if window % 16:
        raise ValueError(f"window must be a multiple of 16, got {window}")
    out = _roi_align_vjp(
        crop_size,
        interpret,
        level_stride,
        jnp.dtype(window_dtype).name,
        backward,
        int(window),
        features,
        jax.lax.stop_gradient(rois),
        act,
        ih,
        iw,
    )
    return out[0] if single else out


def _norm_boxes(rois, ih, iw):
    """xyxy pixel rois -> TF (y1, x1, y2, x2) normalized by image shape."""
    return jnp.stack(
        [rois[:, 1] / ih, rois[:, 0] / iw, rois[:, 3] / ih, rois[:, 2] / iw],
        axis=1,
    )


def _coord_scales(ih, iw, h: int, w: int, level_stride):
    """Per-image (y, x) multipliers mapping pixel coords to feature cells.

    With a stride, coords target the image's valid feature extent
    ceil(dim / stride) on the padded bucket grid; without, the whole grid
    (reference semantics on an unpadded map). Returns (gy, gx, by, bx):
    pixel->cell scales and the max in-range cell per axis.
    """
    if level_stride is None:
        gy = (h - 1.0) / ih
        gx = (w - 1.0) / iw
        by = jnp.full_like(ih, h - 1.0)
        bx = jnp.full_like(iw, w - 1.0)
    else:
        s = float(level_stride)
        by = jnp.ceil(ih / s) - 1.0
        bx = jnp.ceil(iw / s) - 1.0
        gy = by / ih
        gx = bx / iw
    return gy, gx, by, bx


def _einsum_equiv(features, rois, act, ih, iw, crop_size, level_stride):
    """Einsum-path forward with the same signature as the pallas kernel —
    used only to derive the backward (VJP w.r.t. features)."""
    from tf_eager_object_detection_tpu.ops.roi_align import crop_and_resize

    h, w = features.shape[1], features.shape[2]
    gy, gx, _, _ = _coord_scales(ih, iw, h, w, level_stride)

    def one(f, r, fy, fx):
        boxes = jnp.stack(
            [
                r[:, 1] * fy / (h - 1.0),
                r[:, 0] * fx / (w - 1.0),
                r[:, 3] * fy / (h - 1.0),
                r[:, 2] * fx / (w - 1.0),
            ],
            axis=1,
        )
        return crop_and_resize(f, boxes, crop_size)

    out = jax.vmap(one)(features, rois, gy, gx)
    return out * act[..., None, None, None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _roi_align_vjp(
    crop_size, interpret, level_stride, window_dtype, backward, window,
    features, rois, act, ih, iw,
):
    return _pallas_forward(
        features, rois, act, ih, iw, crop_size, interpret, level_stride,
        window_dtype, window,
    )


def _roi_align_vjp_fwd(
    crop_size, interpret, level_stride, window_dtype, backward, window,
    features, rois, act, ih, iw,
):
    out = _pallas_forward(
        features, rois, act, ih, iw, crop_size, interpret, level_stride,
        window_dtype, window,
    )
    return out, (features, rois, act, ih, iw)


def _roi_align_vjp_bwd(
    crop_size, interpret, level_stride, window_dtype, backward, window, res, g
):
    features, rois, act, ih, iw = res
    if backward == "window":
        df = _pallas_backward(
            g, features.shape, rois, act, ih, iw, crop_size, interpret,
            level_stride, window,
        )
    else:
        _, vjp = jax.vjp(
            lambda f: _einsum_equiv(
                f, rois, act, ih, iw, crop_size, level_stride
            ),
            features,
        )
        (df,) = vjp(g)
    # the window backward accumulates in f32 regardless of the feature
    # dtype (precision); the cotangent must still match the primal dtype
    # or grad accumulation with other bf16 consumers of the same feature
    # map (e.g. the RPN head convs) fails a dtype assertion
    return (
        df.astype(features.dtype),
        jnp.zeros_like(rois),
        jnp.zeros_like(act),
        jnp.zeros_like(ih),
        jnp.zeros_like(iw),
    )


_roi_align_vjp.defvjp(_roi_align_vjp_fwd, _roi_align_vjp_bwd)


def _window_geometry(
    rois, active, ih, iw, b, n, h, w, s, level_stride, row_align, c, window
):
    """Shared forward/backward geometry: per-roi window origins (tile-aligned,
    pre-divided for Mosaic), absolute sample coords, active mask, and the
    padded plane extents. The backward MUST use the identical geometry or the
    VJP scatters to the wrong cells."""
    r = jax.lax.stop_gradient(rois)
    # TF crop_and_resize sampling rule on boxes normalized by image shape,
    # mapped onto each image's valid feature extent (see _coord_scales)
    gy, gx, by, bx = _coord_scales(ih, iw, h, w, level_stride)
    y1 = r[:, :, 1] * gy[:, None]
    y2 = r[:, :, 3] * gy[:, None]
    x1 = r[:, :, 0] * gx[:, None]
    x2 = r[:, :, 2] * gx[:, None]

    idx = jnp.arange(s, dtype=jnp.float32)
    ys = y1[..., None] + (y2 - y1)[..., None] * idx / (s - 1)  # [B, N, S]
    xs = x1[..., None] + (x2 - x1)[..., None] * idx / (s - 1)
    # TF zeroes whole samples outside the (valid extent of the) map; push
    # those coords far out so their tent weights vanish (epsilon-tolerant
    # bounds as in roi_align.py)
    eps = 1e-3
    y_bad = (ys < -eps) | (ys > by[:, None, None] + eps)
    x_bad = (xs < -eps) | (xs > bx[:, None, None] + eps)
    ys = jnp.where(y_bad, -1e9, jnp.clip(ys, 0.0, by[:, None, None]))
    xs = jnp.where(x_bad, -1e9, jnp.clip(xs, 0.0, bx[:, None, None]))

    # pad so a window-sized window always fits inside each image's rows;
    # hp is rounded to the sublane tile (8 rows f32, 16 rows bf16) so
    # per-image row bases (b * hp) keep DMA origins tile-aligned
    hp = -(-max(h, window) // row_align) * row_align
    wp = max(w, window)

    # per-roi window origin: floor of the smallest in-range sample coord,
    # clamped inside this image's row span of the folded plane
    ymin = jnp.min(jnp.where(y_bad, jnp.inf, ys), axis=-1)
    xmin = jnp.min(jnp.where(x_bad, jnp.inf, xs), axis=-1)
    row_base = (jnp.arange(b, dtype=jnp.float32) * hp)[:, None]
    sy = jnp.clip(jnp.floor(jnp.where(jnp.isfinite(ymin), ymin, 0.0)), 0, hp - window)
    sx = jnp.clip(jnp.floor(jnp.where(jnp.isfinite(xmin), xmin, 0.0)), 0, wp - window)
    # Mosaic requires DMA slice origins aligned to the (8, 128) tile: round
    # the row origin down to the sublane tile and the column origin so sx*c
    # is a lane-tile multiple (a no-op when c is a multiple of 128). Costs
    # only window margin — worst case 57 usable rows (f32), still over the
    # ~40-cell span bound.
    sy8 = (sy + row_base).reshape(b * n).astype(jnp.int32) // row_align
    lane_align = 128 // math.gcd(c, 128)
    sxa = sx.reshape(b * n).astype(jnp.int32) // lane_align

    coords = jnp.stack([ys + row_base[..., None], xs], axis=2)  # [B, N, 2, S]
    coords = coords.reshape(b * n, 2, s)
    act = (jnp.asarray(active) != 0).astype(jnp.int32).reshape(b * n)
    return sy8, sxa, coords, act, hp, wp, lane_align


@functools.partial(
    jax.jit,
    static_argnames=(
        "crop_size", "interpret", "level_stride", "window_dtype", "window"
    ),
)
def _pallas_forward(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    active: jnp.ndarray,
    image_height,
    image_width,
    crop_size: int,
    interpret: bool = False,
    level_stride: int | None = None,
    window_dtype: str = "float32",
    window: int = WINDOW,
) -> jnp.ndarray:
    b, h, w, c = features.shape
    n = rois.shape[1]
    s = crop_size
    ih = jnp.broadcast_to(jnp.asarray(image_height, jnp.float32), (b,))
    iw = jnp.broadcast_to(jnp.asarray(image_width, jnp.float32), (b,))
    wdtype = jnp.dtype(window_dtype)
    row_align = 16 if wdtype == jnp.bfloat16 else 8
    sy8, sxa, coords, act, hp, wp, lane_align = _window_geometry(
        rois, active, ih, iw, b, n, h, w, s, level_stride, row_align, c,
        window,
    )
    if (hp, wp) != (h, w):
        features = jnp.pad(features, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    feat2d = features.reshape(b * hp, wp * c)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * n,),
        in_specs=[
            pl.BlockSpec((1, 2, s), lambda i, sy, sx, a: (i, 0, 0)),
            # keep the full pyramid level in HBM; each roi DMAs only its
            # window (ANY lets the compiler pull the whole map into VMEM)
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((1, s, s * c), lambda i, sy, sx, a: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((window, window * c), wdtype),
            pltpu.VMEM((window, window * c), wdtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, crop=s, c=c, lane_align=lane_align,
            row_align=row_align, total=b * n, window=window,
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, s, s * c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sy8, sxa, act, coords, feat2d.astype(wdtype))
    return out.reshape(b, n, s, s, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "feat_shape", "crop_size", "interpret", "level_stride", "window"
    ),
)
def _pallas_backward(
    g: jnp.ndarray,
    feat_shape,
    rois: jnp.ndarray,
    active: jnp.ndarray,
    image_height,
    image_width,
    crop_size: int,
    interpret: bool = False,
    level_stride: int | None = None,
    window: int = WINDOW,
) -> jnp.ndarray:
    """df/dfeatures for the windowed forward: per-roi window scatter-add.

    The einsum backward materializes [N, S, W, C] transposes (the dominant
    layout copies in the FPN train profile); this kernel instead
    read-modify-writes each active roi's 64-cell window in a zeroed df
    plane (grid steps are sequential on a TPU core, so overlapping windows
    accumulate race-free). Gradients always accumulate in f32.
    """
    b, h, w, c = feat_shape
    n = rois.shape[1]
    s = crop_size
    ih = jnp.broadcast_to(jnp.asarray(image_height, jnp.float32), (b,))
    iw = jnp.broadcast_to(jnp.asarray(image_width, jnp.float32), (b,))
    row_align = 8  # f32 plane
    sy8, sxa, coords, act, hp, wp, lane_align = _window_geometry(
        rois, active, ih, iw, b, n, h, w, s, level_stride, row_align, c,
        window,
    )
    g2 = g.reshape(b * n, s, s * c).astype(jnp.float32)
    df0 = jnp.zeros((b * hp, wp * c), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b * n,),
        in_specs=[
            pl.BlockSpec((1, 2, s), lambda i, sy, sx, a: (i, 0, 0)),
            pl.BlockSpec((1, s, s * c), lambda i, sy, sx, a: (i, 0, 0)),
            # the zero-initialized df plane, aliased onto the output below
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((window, window * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    df = pl.pallas_call(
        functools.partial(
            _bwd_kernel, crop=s, c=c, lane_align=lane_align,
            row_align=row_align, window=window,
        ),
        out_shape=jax.ShapeDtypeStruct((b * hp, wp * c), jnp.float32),
        grid_spec=grid_spec,
        # flattened input index (incl. the 3 scalar-prefetch args):
        # sy8=0 sxa=1 act=2 coords=3 g=4 df0=5 -> aliases output 0
        input_output_aliases={5: 0},
        interpret=interpret,
    )(sy8, sxa, act, coords, g2, df0)
    df = df.reshape(b, hp, wp, c)[:, :h, :w, :]
    return df


# ---------------------------------------------------------------------------
# Fused multi-level kernel: one grid step per roi across the WHOLE pyramid.
#
# The per-level kernel runs a (B*N)-step grid per pyramid level — at FPN
# train shapes that is 4x256 forward + 4x256 backward grid steps per train
# step, of which 3/4 are level-inactive (they only zero their output block)
# — plus a 4-way output sum on the XLA side. FPN assigns every roi to
# EXACTLY one level (base_fpn_model.py:309-313), so the fused kernel makes
# the level a scalar-prefetched per-roi input instead: (B*N) grid steps
# total, each DMA-ing its window from the right level's plane, one output,
# no zero-blocks, no cross-level sum.
# ---------------------------------------------------------------------------


def _ml_window_copy(
    feat_refs, lvl_ref, sy8_ref, sxa_ref, j, win_ref, sem, c, lane_align,
    row_align, window, start: bool,
):
    """Issue (or wait for) roi j's window copy from its level's plane.

    The async-copy descriptor must be identical at start and wait, so both
    go through this helper; the level branch re-selects the same ref.
    """
    for k, fref in enumerate(feat_refs):
        @pl.when(lvl_ref[j] == k)
        def _(fref=fref):
            cp = pltpu.make_async_copy(
                fref.at[
                    pl.ds(sy8_ref[j] * row_align, window),
                    pl.ds(sxa_ref[j] * (lane_align * c), window * c),
                ],
                win_ref,
                sem,
            )
            if start:
                cp.start()
            else:
                cp.wait()


def _ml_kernel(
    lvl_ref,
    sy8_ref,
    sxa_ref,
    valid_ref,
    coords_ref,
    *rest,
    crop: int,
    c: int,
    lane_align: int,
    row_align: int,
    total: int,
    window: int,
    n_levels: int,
):
    feat_refs = rest[:n_levels]
    out_ref, win0_ref, win1_ref, sem0, sem1 = rest[n_levels:]
    i = pl.program_id(0)
    sy = sy8_ref[i] * row_align
    sx = sxa_ref[i] * lane_align

    @pl.when(jnp.logical_and(i == 0, valid_ref[i] != 0))
    def _prologue():
        _ml_window_copy(
            feat_refs, lvl_ref, sy8_ref, sxa_ref, i, win0_ref, sem0, c,
            lane_align, row_align, window, start=True,
        )

    nxt = jnp.minimum(i + 1, total - 1)
    start_next = jnp.logical_and(i + 1 < total, valid_ref[nxt] != 0)

    @pl.when(jnp.logical_and(start_next, (i + 1) % 2 == 0))
    def _start_next_even():
        _ml_window_copy(
            feat_refs, lvl_ref, sy8_ref, sxa_ref, nxt, win0_ref, sem0, c,
            lane_align, row_align, window, start=True,
        )

    @pl.when(jnp.logical_and(start_next, (i + 1) % 2 == 1))
    def _start_next_odd():
        _ml_window_copy(
            feat_refs, lvl_ref, sy8_ref, sxa_ref, nxt, win1_ref, sem1, c,
            lane_align, row_align, window, start=True,
        )

    @pl.when(valid_ref[i] == 0)
    def _skip():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    def _interpolate(win_ref):
        ys = coords_ref[0, 0:1, :] - sy.astype(jnp.float32)
        xs = coords_ref[0, 1:2, :] - sx.astype(jnp.float32)
        cells = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1).astype(
            jnp.float32
        )
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.transpose(ys) - cells))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(jnp.transpose(xs) - cells))
        win = win_ref[:, :]
        win_prec = (
            None if win.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        )
        rows = jnp.dot(
            wy.astype(win.dtype),
            win,
            preferred_element_type=jnp.float32,
            precision=win_prec,
        )
        rows3 = rows.reshape(crop, window, c)
        wxb = jnp.broadcast_to(wx[None], (crop, crop, window))
        out = jax.lax.dot_general(
            wxb,
            rows3,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[0] = out.reshape(crop, crop * c)

    @pl.when(jnp.logical_and(valid_ref[i] != 0, i % 2 == 0))
    def _compute_even():
        _ml_window_copy(
            feat_refs, lvl_ref, sy8_ref, sxa_ref, i, win0_ref, sem0, c,
            lane_align, row_align, window, start=False,
        )
        _interpolate(win0_ref)

    @pl.when(jnp.logical_and(valid_ref[i] != 0, i % 2 == 1))
    def _compute_odd():
        _ml_window_copy(
            feat_refs, lvl_ref, sy8_ref, sxa_ref, i, win1_ref, sem1, c,
            lane_align, row_align, window, start=False,
        )
        _interpolate(win1_ref)


def _ml_bwd_kernel(
    lvl_ref,
    sy8_ref,
    sxa_ref,
    valid_ref,
    coords_ref,
    g_ref,
    *rest,
    crop: int,
    c: int,
    lane_align: int,
    row_align: int,
    window: int,
    n_levels: int,
):
    """Fused-backward: RMW each roi's window in its own level's df plane.
    dfin refs are aliased onto the df outputs; grid steps are sequential so
    overlapping windows accumulate race-free."""
    df_refs = rest[n_levels : 2 * n_levels]  # dfin refs ignored
    win_ref, sem = rest[2 * n_levels], rest[2 * n_levels + 1]
    i = pl.program_id(0)
    sy = sy8_ref[i] * row_align
    sx = sxa_ref[i] * lane_align

    @pl.when(valid_ref[i] != 0)
    def _accumulate():
        _ml_window_copy(
            df_refs, lvl_ref, sy8_ref, sxa_ref, i, win_ref, sem, c,
            lane_align, row_align, window, start=True,
        )
        _ml_window_copy(
            df_refs, lvl_ref, sy8_ref, sxa_ref, i, win_ref, sem, c,
            lane_align, row_align, window, start=False,
        )

        ys = coords_ref[0, 0:1, :] - sy.astype(jnp.float32)
        xs = coords_ref[0, 1:2, :] - sx.astype(jnp.float32)
        cells = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).astype(
            jnp.float32
        )
        wyt = jnp.maximum(0.0, 1.0 - jnp.abs(cells - ys))
        wxt = jnp.maximum(0.0, 1.0 - jnp.abs(cells - xs))
        g2 = g_ref[0]
        t1 = jnp.dot(
            wyt,
            g2,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        t13 = t1.reshape(window, crop, c)
        wxb = jnp.broadcast_to(wxt[None], (window, window, crop))
        contrib = jax.lax.dot_general(
            wxb,
            t13,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        win_ref[:, :] = win_ref[:, :] + contrib.reshape(window, window * c)

        for k, dref in enumerate(df_refs):
            @pl.when(lvl_ref[i] == k)
            def _(dref=dref):
                cp = pltpu.make_async_copy(
                    win_ref,
                    dref.at[
                        pl.ds(sy8_ref[i] * row_align, window),
                        pl.ds(sxa_ref[i] * (lane_align * c), window * c),
                    ],
                    sem,
                )
                cp.start()
                cp.wait()


def _multilevel_geometry(
    rois, levels, valid, ih, iw, shapes, strides, s, row_align, c, window
):
    """Per-roi window origins/coords against each roi's OWN level's plane.

    shapes: tuple of (h_l, w_l); strides: per-level feature strides.
    Returns (lvl, sy8, sxa, valid, coords, hps, wps, lane_align) with the
    flat [B*N] per-roi arrays selected level-wise.
    """
    b, n = rois.shape[:2]
    sy8s, sxas, coordss, hps, wps = [], [], [], [], []
    lane_align = 128 // math.gcd(c, 128)
    for (h_l, w_l), stride_l in zip(shapes, strides):
        sy8_l, sxa_l, coords_l, _, hp_l, wp_l, la = _window_geometry(
            rois, jnp.ones((b, n), jnp.int32), ih, iw, b, n, h_l, w_l, s,
            stride_l, row_align, c, window,
        )
        assert la == lane_align
        sy8s.append(sy8_l)
        sxas.append(sxa_l)
        coordss.append(coords_l)
        hps.append(hp_l)
        wps.append(wp_l)
    lvl = levels.reshape(b * n).astype(jnp.int32)
    sy8 = jnp.select([lvl == k for k in range(len(shapes))], sy8s)
    sxa = jnp.select([lvl == k for k in range(len(shapes))], sxas)
    coords = jnp.select(
        [(lvl == k)[:, None, None] for k in range(len(shapes))], coordss
    )
    val = (jnp.asarray(valid) != 0).astype(jnp.int32).reshape(b * n)
    return lvl, sy8, sxa, val, coords, tuple(hps), tuple(wps), lane_align


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "crop_size", "interpret", "window_dtype", "window"
    ),
)
def _ml_forward(
    p_list,
    rois,
    levels,
    valid,
    ih,
    iw,
    strides,
    crop_size: int,
    interpret: bool = False,
    window_dtype: str = "float32",
    window: int = WINDOW,
):
    b, n = rois.shape[:2]
    c = p_list[0].shape[-1]
    s = crop_size
    wdtype = jnp.dtype(window_dtype)
    row_align = 16 if wdtype == jnp.bfloat16 else 8
    shapes = tuple((f.shape[1], f.shape[2]) for f in p_list)
    lvl, sy8, sxa, val, coords, hps, wps, lane_align = _multilevel_geometry(
        rois, levels, valid, ih, iw, shapes, strides, s, row_align, c, window
    )
    planes = []
    for f, (h_l, w_l), hp_l, wp_l in zip(p_list, shapes, hps, wps):
        if (hp_l, wp_l) != (h_l, w_l):
            f = jnp.pad(f, ((0, 0), (0, hp_l - h_l), (0, wp_l - w_l), (0, 0)))
        planes.append(f.reshape(b * hp_l, wp_l * c).astype(wdtype))

    nl = len(planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # lvl, sy8, sxa, valid
        grid=(b * n,),
        in_specs=[pl.BlockSpec((1, 2, s), lambda i, *_: (i, 0, 0))]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * nl,
        out_specs=pl.BlockSpec((1, s, s * c), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((window, window * c), wdtype),
            pltpu.VMEM((window, window * c), wdtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _ml_kernel, crop=s, c=c, lane_align=lane_align,
            row_align=row_align, total=b * n, window=window, n_levels=nl,
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, s, s * c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(lvl, sy8, sxa, val, coords, *planes)
    return out.reshape(b, n, s, s, c)


@functools.partial(
    jax.jit,
    static_argnames=(
        "feat_shapes", "strides", "crop_size", "interpret", "window"
    ),
)
def _ml_backward(
    g,
    feat_shapes,
    rois,
    levels,
    valid,
    ih,
    iw,
    strides,
    crop_size: int,
    interpret: bool = False,
    window: int = WINDOW,
):
    b, n = rois.shape[:2]
    c = feat_shapes[0][-1]
    s = crop_size
    row_align = 8  # f32 planes
    shapes = tuple((fs[1], fs[2]) for fs in feat_shapes)
    lvl, sy8, sxa, val, coords, hps, wps, lane_align = _multilevel_geometry(
        rois, levels, valid, ih, iw, shapes, strides, s, row_align, c, window
    )
    g2 = g.reshape(b * n, s, s * c).astype(jnp.float32)
    dfs0 = [
        jnp.zeros((b * hp_l, wp_l * c), jnp.float32)
        for hp_l, wp_l in zip(hps, wps)
    ]
    nl = len(dfs0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b * n,),
        in_specs=[
            pl.BlockSpec((1, 2, s), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, s, s * c), lambda i, *_: (i, 0, 0)),
        ]
        + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * nl,
        out_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * nl,
        scratch_shapes=[
            pltpu.VMEM((window, window * c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # flattened input index (incl. the 4 scalar-prefetch args): lvl=0 sxa..=1,2
    # valid=3 coords=4 g=5 dfin_k=6+k -> aliases output k
    dfs = pl.pallas_call(
        functools.partial(
            _ml_bwd_kernel, crop=s, c=c, lane_align=lane_align,
            row_align=row_align, window=window, n_levels=nl,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * hp_l, wp_l * c), jnp.float32)
            for hp_l, wp_l in zip(hps, wps)
        ],
        grid_spec=grid_spec,
        input_output_aliases={6 + k: k for k in range(nl)},
        interpret=interpret,
    )(lvl, sy8, sxa, val, coords, g2, *dfs0)
    out = []
    for df, (h_l, w_l), hp_l, wp_l in zip(dfs, shapes, hps, wps):
        out.append(df.reshape(b, hp_l, wp_l, c)[:, :h_l, :w_l, :])
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _ml_vjp(strides, crop_size, interpret, window_dtype, window,
            p_list, rois, levels_f, valid_f, ih, iw):
    return _ml_forward(
        p_list, rois, levels_f.astype(jnp.int32), valid_f, ih, iw, strides,
        crop_size, interpret, window_dtype, window,
    )


def _ml_vjp_fwd(strides, crop_size, interpret, window_dtype, window,
                p_list, rois, levels_f, valid_f, ih, iw):
    out = _ml_forward(
        p_list, rois, levels_f.astype(jnp.int32), valid_f, ih, iw, strides,
        crop_size, interpret, window_dtype, window,
    )
    return out, (
        tuple(f.shape for f in p_list),
        # dtype carriers: residuals must be JAX arrays, so each primal's
        # dtype travels as a zero-size array of that dtype
        tuple(jnp.zeros((0,), f.dtype) for f in p_list),
        rois, levels_f, valid_f, ih, iw,
    )


def _ml_vjp_bwd(strides, crop_size, interpret, window_dtype, window, res, g):
    feat_shapes, dtype_carriers, rois, levels_f, valid_f, ih, iw = res
    dfs = _ml_backward(
        g, feat_shapes, rois, levels_f.astype(jnp.int32), valid_f, ih, iw,
        strides, crop_size, interpret, window,
    )
    # f32 accumulation inside; cotangent dtype must match each primal's
    dfs = tuple(df.astype(c.dtype) for df, c in zip(dfs, dtype_carriers))
    return (
        dfs,
        jnp.zeros_like(rois),
        jnp.zeros_like(levels_f),
        jnp.zeros_like(valid_f),
        jnp.zeros_like(ih),
        jnp.zeros_like(iw),
    )


_ml_vjp.defvjp(_ml_vjp_fwd, _ml_vjp_bwd)


def pallas_roi_align_multilevel(
    p_list,
    rois,
    levels,
    image_height,
    image_width,
    crop_size: int,
    strides,
    valid=None,
    interpret: bool = False,
    window_dtype: jnp.dtype = jnp.float32,
    window: int = WINDOW,
):
    """Fused-pyramid RoIAlign: every roi's window from its own level, one
    kernel launch for the whole pyramid (see module comment above).

    p_list: per-level [B, H_l, W_l, C] padded-bucket planes (p2..p5);
    rois: [B, N, 4] xyxy pixels; levels: [B, N] int level INDEX into p_list
    (0 = min_level); strides: per-level feature strides (static);
    valid: [B, N] optional — rois with valid == 0 return zero crops and
    skip their DMA entirely. Sampling semantics identical to summing
    `pallas_roi_align_window(p_list[k], rois, levels == k, ...)` over k
    (tested), i.e. roi_crop_fpn / TF crop_and_resize per level.
    Returns [B, N, S, S, C] f32.
    """
    if window % 16:
        raise ValueError(f"window must be a multiple of 16, got {window}")
    b, n = rois.shape[:2]
    if valid is None:
        valid = jnp.ones((b, n), jnp.float32)
    ih = jnp.broadcast_to(jnp.asarray(image_height, jnp.float32), (b,))
    iw = jnp.broadcast_to(jnp.asarray(image_width, jnp.float32), (b,))
    return _ml_vjp(
        tuple(int(s) for s in strides),
        int(crop_size),
        bool(interpret),
        jnp.dtype(window_dtype).name,
        int(window),
        tuple(p_list),
        jax.lax.stop_gradient(rois),
        levels.astype(jnp.float32),
        jnp.asarray(valid).astype(jnp.float32),
        ih,
        iw,
    )
