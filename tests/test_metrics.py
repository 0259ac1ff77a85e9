"""MetricWriter: event files must be readable by TensorBoard/TF tooling."""

import glob
import json
import os

import numpy as np
import pytest


def test_jsonl_and_event_file(tmp_path):
    from tf_eager_object_detection_tpu.training.metrics import MetricWriter

    d = str(tmp_path / "logs")
    w = MetricWriter(d)
    w.write_scalars(10, {"total_loss": 1.5, "rpn_cls_loss": 0.25})
    w.write_scalars(20, {"total_loss": 1.25, "rpn_cls_loss": 0.125})
    img = np.zeros((8, 8, 3), np.uint8)
    w.write_image(20, "gt_boxes", img)
    w.close()

    lines = [json.loads(x) for x in open(os.path.join(d, "train_metrics.jsonl"))]
    assert lines[0]["step"] == 10 and lines[0]["total_loss"] == 1.5
    assert lines[1]["rpn_cls_loss"] == 0.125

    events = glob.glob(os.path.join(d, "events.out.tfevents.*"))
    assert len(events) == 1

    tf = pytest.importorskip("tensorflow")
    got = {}
    images = 0
    for rec in tf.data.TFRecordDataset(events):
        ev = tf.compat.v1.Event()
        ev.ParseFromString(rec.numpy())
        if ev.HasField("summary"):
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    got[(ev.step, v.tag)] = v.simple_value
                if v.HasField("image"):
                    images += 1
    assert got[(10, "total_loss")] == 1.5
    assert abs(got[(20, "rpn_cls_loss")] - 0.125) < 1e-7
    assert images == 1


def test_sampler_uniformity():
    """fg subsampling should be (approximately) uniform over candidates."""
    import jax
    import jax.numpy as jnp

    from tf_eager_object_detection_tpu.ops.sampling import _select_topk_random

    n, k, trials = 40, 10, 300
    cand = jnp.ones((n,), bool)
    counts = np.zeros(n)
    sel = jax.jit(lambda key: _select_topk_random(cand, k, key))
    for t in range(trials):
        counts += np.asarray(sel(jax.random.PRNGKey(t)))
    expected = trials * k / n  # 75
    # loose 5-sigma-ish bound for binomial(300, 0.25)
    assert np.all(np.abs(counts - expected) < 40), counts
