"""Reference-as-oracle parity tests.

Executes the reference's own pure-TF utility modules
(/root/reference/object_detection/utils/{bbox_tf,bbox_transform,
anchor_generator}.py and model/losses.py) under TF2 eager via
`tf.compat.v1`, and asserts the JAX ports produce identical numbers on
random fixtures. Unlike the other golden tests (which compare against
TF's *fused kernels* or hand-derived oracles), these runs compare against
the reference's executing code itself — a wrong reading of, e.g., the +1
width convention would fail here even if internally consistent.

The reference source is treated as data: its functions are executed on
our fixtures; nothing else from the tree is imported or followed.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

REF_ROOT = "/root/reference"

_STRIP_PREFIXES = (
    "import tensorflow",
    "import numpy",
    "from six.moves",
    "from object_detection",
)


def _load_ref(relpath: str, inject=None, src_replace=None):
    """Exec a reference module's source with tf -> tf.compat.v1.

    The reference is TF1-API (tf.to_float / tf.log / tf.losses.*); binding
    `tf` to tf.compat.v1 runs it unchanged under TF2 eager. `inject` maps
    names the module imports `from object_detection...` to already-loaded
    oracle functions (the imports themselves are stripped). `src_replace`
    maps literal source snippets to behavior-preserving rewrites (used for
    keras-3 call-convention strictness, e.g. keyword-ifying a positional
    `training` argument). Returns the module namespace as a dict.
    """
    path = os.path.join(REF_ROOT, relpath)
    src = open(path).read()
    for old, new in (src_replace or {}).items():
        assert old in src, f"src_replace pattern not found in {relpath}: {old!r}"
        src = src.replace(old, new)
    # strip only TOP-LEVEL imports (function-local `import numpy as xp` in
    # generate_by_anchor_base_np must survive)
    lines = [
        line
        for line in src.splitlines()
        if not line.startswith(_STRIP_PREFIXES)
    ]
    from tensorflow.python.platform import tf_logging

    ns = {
        "tf": tf.compat.v1,
        "np": np,
        "range": range,
        "tf_logging": tf_logging,
        "__name__": "ref_oracle_" + relpath.replace("/", "_"),
        "__file__": path,
    }
    if inject:
        ns.update(inject)
    exec(compile("\n".join(lines), path, "exec"), ns)
    return ns


@pytest.fixture(scope="module")
def ref_bbox_tf():
    return _load_ref("object_detection/utils/bbox_tf.py")


@pytest.fixture(scope="module")
def ref_bbox_transform():
    return _load_ref("object_detection/utils/bbox_transform.py")


@pytest.fixture(scope="module")
def ref_anchors():
    return _load_ref("object_detection/utils/anchor_generator.py")


@pytest.fixture(scope="module")
def ref_losses():
    return _load_ref("object_detection/model/losses.py")


def _rand_boxes(rng, n, size=600.0):
    x1 = rng.uniform(0, size - 2, n)
    y1 = rng.uniform(0, size - 2, n)
    w = rng.uniform(1, 200, n)
    h = rng.uniform(1, 200, n)
    return np.stack(
        [x1, y1, np.minimum(x1 + w, size + 50), np.minimum(y1 + h, size + 50)], 1
    ).astype(np.float32)


# --------------------------------------------------------------- bbox_tf


def test_pairwise_iou_matches_reference(ref_bbox_tf):
    from tf_eager_object_detection_tpu.core.boxes import pairwise_iou

    rng = np.random.RandomState(0)
    b1 = _rand_boxes(rng, 64)
    b2 = _rand_boxes(rng, 17)
    want = ref_bbox_tf["pairwise_iou"](b1, b2).numpy()
    got = np.asarray(pairwise_iou(b1, b2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pairwise_iou_zero_intersection_matches_reference(ref_bbox_tf):
    """The reference forces IoU to exactly 0 where intersection == 0
    (bbox_tf.py:54-56); check disjoint boxes hit that branch identically."""
    from tf_eager_object_detection_tpu.core.boxes import pairwise_iou

    b1 = np.array([[0, 0, 10, 10], [500, 500, 520, 520]], np.float32)
    b2 = np.array([[100, 100, 120, 120]], np.float32)
    want = ref_bbox_tf["pairwise_iou"](b1, b2).numpy()
    got = np.asarray(pairwise_iou(b1, b2))
    np.testing.assert_array_equal(got, want)
    assert (want == 0).all()


@pytest.mark.parametrize("min_edge", [None, 10.0, 40.0])
def test_bboxes_clip_filter_matches_reference(ref_bbox_tf, min_edge):
    """clip_boxes + min_edge_mask == the reference's clamp + dynamic filter
    (bbox_tf.py:59-84), with the mask's True set matching the gathered idx.

    Note the reference computes its two edge lengths from mismatched channel
    pairs (y_len from x-coords, bbox_tf.py:81-82) — but requiring BOTH >=
    min_edge makes the kept set identical to the straightforward w/h form
    the port uses; this test is the executable proof of that claim
    (core/boxes.py min_edge_mask docstring).
    """
    from tf_eager_object_detection_tpu.core.boxes import clip_boxes, min_edge_mask

    rng = np.random.RandomState(1)
    boxes = _rand_boxes(rng, 80, size=400.0)
    max_h, max_w = 380.0, 390.0
    kept_ref, idx_ref = ref_bbox_tf["bboxes_clip_filter"](
        boxes, 0.0, max_h, max_w, min_edge=min_edge
    )
    clipped = np.asarray(clip_boxes(boxes, max_h, max_w))
    if min_edge is None:
        np.testing.assert_allclose(clipped, kept_ref.numpy(), atol=1e-5)
    else:
        mask = np.asarray(min_edge_mask(clipped, min_edge))
        np.testing.assert_array_equal(np.where(mask)[0], idx_ref.numpy())
        np.testing.assert_allclose(clipped[mask], kept_ref.numpy(), atol=1e-5)
        assert mask.sum() > 0  # fixture actually exercises the filter
        if min_edge == 40.0:
            assert not mask.all()


def test_bboxes_range_filter_matches_reference(ref_bbox_tf):
    from tf_eager_object_detection_tpu.core.boxes import inside_image_mask

    rng = np.random.RandomState(2)
    # anchors straddling the image boundary, incl. negative coords
    anchors = _rand_boxes(rng, 120, size=300.0) - 50.0
    max_h, max_w = 260.0, 280.0
    idx_ref = ref_bbox_tf["bboxes_range_filter"](anchors, max_h, max_w).numpy()
    mask = np.asarray(inside_image_mask(anchors, max_h, max_w))
    np.testing.assert_array_equal(np.where(mask)[0], idx_ref)
    assert 0 < mask.sum() < len(anchors)


# --------------------------------------------------------- bbox_transform


@pytest.mark.parametrize(
    "means,stds",
    [
        ((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0)),  # RPN config
        ((0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)),  # RoI config
        ((0.1, -0.2, 0.05, 0.0), (0.3, 0.3, 0.5, 0.5)),
    ],
)
def test_encode_matches_reference(ref_bbox_transform, means, stds):
    from tf_eager_object_detection_tpu.core.transforms import encode_boxes

    rng = np.random.RandomState(3)
    src = _rand_boxes(rng, 50)
    dst = _rand_boxes(rng, 50)
    want = ref_bbox_transform["encode_bbox_with_mean_and_std"](
        src, dst, list(means), list(stds)
    ).numpy()
    got = np.asarray(encode_boxes(src, dst, means, stds))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "means,stds",
    [
        ((0.0, 0.0, 0.0, 0.0), (1.0, 1.0, 1.0, 1.0)),
        ((0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)),
    ],
)
def test_decode_matches_reference(ref_bbox_transform, means, stds):
    """Deltas kept inside the documented log(1000/16) clamp (the port's one
    deliberate deviation, core/transforms.py:60-63) so both paths agree."""
    from tf_eager_object_detection_tpu.core.transforms import decode_boxes

    rng = np.random.RandomState(4)
    anchors = _rand_boxes(rng, 70)
    deltas = rng.randn(70, 4).astype(np.float32)
    want = ref_bbox_transform["decode_bbox_with_mean_and_std"](
        anchors, deltas, list(means), list(stds)
    ).numpy()
    got = np.asarray(decode_boxes(anchors, deltas, means, stds))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_encode_decode_roundtrip_through_reference(ref_bbox_transform):
    """Cross-check: reference-encode -> port-decode recovers the gt box.

    Box edge ratios bounded so |log(gw/w)| stays under the port's documented
    log(1000/16) decode clamp (core/transforms.py:60-63)."""
    from tf_eager_object_detection_tpu.core.transforms import decode_boxes

    def bounded_boxes(rng, n):
        x1 = rng.uniform(0, 300, n)
        y1 = rng.uniform(0, 300, n)
        w = rng.uniform(50, 200, n)  # ratio <= 4 -> |log| <= 1.39 << 4.135
        h = rng.uniform(50, 200, n)
        return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)

    rng = np.random.RandomState(5)
    src = bounded_boxes(rng, 40)
    dst = bounded_boxes(rng, 40)
    means, stds = (0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    deltas = ref_bbox_transform["encode_bbox_with_mean_and_std"](
        src, dst, list(means), list(stds)
    ).numpy()
    back = np.asarray(decode_boxes(src, deltas, means, stds))
    # The reference's own convention asymmetry (bbox_transform.py:40 TODO):
    # encode measures w = x2-x1+1 but decode emits x2 = x1+w (no -1), so a
    # perfect roundtrip lands exactly +1 on x2/y2. The port reproduces it.
    expected = dst + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(back, expected, rtol=1e-3, atol=0.1)


# -------------------------------------------------------------- anchors


def test_generate_anchor_base_matches_reference(ref_anchors):
    from tf_eager_object_detection_tpu.core.anchors import generate_anchor_base

    for base, ratios, scales in [
        (16, [0.5, 1, 2], [8, 16, 32]),  # Faster R-CNN config
        (16, [0.5, 1, 2], 2 ** np.arange(3, 6)),  # reference defaults
        (8, [0.25, 1, 4], [2, 4]),
    ]:
        want = ref_anchors["generate_anchor_base"](
            base_size=base, ratios=list(ratios), scales=np.asarray(scales)
        )
        got = generate_anchor_base(base, ratios, scales)
        np.testing.assert_array_equal(got, want)


def test_shift_anchor_base_matches_reference_tf(ref_anchors):
    from tf_eager_object_detection_tpu.core.anchors import (
        generate_anchor_base,
        shift_anchor_base,
    )

    base = generate_anchor_base(16, (0.5, 1, 2), (8, 16, 32))
    for gh, gw, stride in [(38, 63, 16), (5, 7, 16), (12, 12, 8)]:
        want = ref_anchors["generate_by_anchor_base_tf"](
            base, stride, gh, gw
        ).numpy()
        got = shift_anchor_base(base, stride, gh, gw)
        np.testing.assert_array_equal(got, want)


def test_shift_anchor_base_matches_reference_np(ref_anchors):
    """The reference's numpy twin applies shifts in (y, x, y, x) order to
    xyxy base anchors (anchor_generator.py:34-38) — the coordinate quirk
    SURVEY U4 notes — while the tf twin (and the port) shift xyxy-wise.
    Prove the port == the np twin modulo exactly that shift transpose."""
    from tf_eager_object_detection_tpu.core.anchors import (
        generate_anchor_base,
        shift_anchor_base,
    )

    base = generate_anchor_base(16, (0.5, 1, 2), (8, 16, 32))
    gh, gw, stride = 20, 30, 16
    want = ref_anchors["generate_by_anchor_base_np"](
        base, stride, gh * stride, gw * stride
    )
    got = shift_anchor_base(base, stride, gh, gw)
    assert got.shape == want.shape
    sy, sx = np.meshgrid(
        np.arange(gh) * stride, np.arange(gw) * stride, indexing="ij"
    )
    shifts_yx = np.stack([sy.ravel(), sx.ravel()] * 2, 1)  # np twin's order
    shifts_xy = np.stack([sx.ravel(), sy.ravel()] * 2, 1)  # tf twin / port
    base_tiled = np.broadcast_to(base[None], (gh * gw, base.shape[0], 4))
    np.testing.assert_allclose(
        want, (base_tiled + shifts_yx[:, None, :]).reshape(-1, 4)
    )
    np.testing.assert_allclose(
        got, (base_tiled + shifts_xy[:, None, :]).reshape(-1, 4)
    )


def test_make_level_anchors_matches_reference(ref_anchors):
    from tf_eager_object_detection_tpu.core.anchors import make_level_anchors

    # FPN config: per-level base size, scale 1.0, 3 ratios (fpn_config.py)
    for base_size, scales, ratios, gh, gw, stride in [
        (32.0, [1.0], [0.5, 1.0, 2.0], 100, 168, 4),
        (64.0, [1.0], [0.5, 1.0, 2.0], 50, 84, 8),
        (512.0, [1.0, 2.0], [0.5, 1.0, 2.0], 7, 11, 64),
    ]:
        want = ref_anchors["make_anchors"](
            base_size, scales, ratios, gh, gw, stride
        ).numpy()
        got = make_level_anchors(base_size, scales, ratios, gh, gw, stride)
        np.testing.assert_allclose(got, want, atol=1e-4)


# --------------------------------------------------------------- losses


def test_cls_loss_matches_reference(ref_losses):
    from tf_eager_object_detection_tpu.ops.losses import cls_loss

    rng = np.random.RandomState(6)
    logits = rng.randn(128, 21).astype(np.float32)
    labels = rng.randint(0, 21, 128)
    want = float(ref_losses["cls_loss"](logits, labels.astype(np.float32)))
    got = float(cls_loss(logits, labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cls_loss_binary_weights_matches_reference(ref_losses):
    """The port's mask semantics == tf.losses' SUM_BY_NONZERO_WEIGHTS for
    the reference's binary selection masks."""
    from tf_eager_object_detection_tpu.ops.losses import cls_loss

    rng = np.random.RandomState(7)
    logits = rng.randn(64, 2).astype(np.float32)
    labels = rng.randint(0, 2, 64)
    w = (rng.rand(64) > 0.4).astype(np.float32)
    want = float(
        ref_losses["cls_loss"](logits, labels.astype(np.float32), weight=w)
    )
    got = float(cls_loss(logits, labels, w))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize(
    "sigma,dim",
    [
        (3.0, (0, 1)),  # RPN reg loss (base_faster_rcnn_model.py:209-211)
        (1.0, (1,)),  # RoI reg loss (:220-222)
    ],
)
def test_smooth_l1_loss_matches_reference(ref_losses, sigma, dim):
    from tf_eager_object_detection_tpu.ops.losses import smooth_l1_loss

    rng = np.random.RandomState(8)
    n = 96
    pred = rng.randn(n, 4).astype(np.float32) * 2
    tgt = rng.randn(n, 4).astype(np.float32)
    # reference inside weights: 1 on sampled-positive rows; outside: 1/num
    inw = np.repeat((rng.rand(n, 1) > 0.5).astype(np.float32), 4, axis=1)
    outw = np.full((n, 4), 1.0 / 37.0, np.float32)
    want = float(
        ref_losses["smooth_l1_loss"](pred, tgt, inw, outw, sigma=sigma, dim=list(dim))
    )
    got = float(smooth_l1_loss(pred, tgt, inw, outw, sigma=sigma, dim=dim))
    np.testing.assert_allclose(got, want, rtol=1e-5)
