"""Config factory with the reference's public signature
(`object_detection/config/config_factory.py:2-15`)."""


def config_factory(data_type, model_type):
    if model_type == "faster_rcnn":
        if data_type == "pascal":
            from tf_eager_object_detection_tpu.config.faster_rcnn_config import (
                PASCAL_CONFIG,
            )

            return PASCAL_CONFIG
        if data_type == "coco":
            from tf_eager_object_detection_tpu.config.faster_rcnn_config import (
                COCO_CONFIG,
            )

            return COCO_CONFIG
    elif model_type == "fpn":
        if data_type == "pascal":
            from tf_eager_object_detection_tpu.config.fpn_config import PASCAL_CONFIG

            return PASCAL_CONFIG

    raise ValueError(
        f"config for dataset type {data_type} and model type {model_type} doesn't exist"
    )


def apply_config_overrides(cfg, overrides):
    """Apply CLI `KEY=JSON` override strings to a config dict, in place.

    TPU-build extension over the reference's fixed presets (SURVEY §5.6:
    the reference has no per-key CLI overrides; editing presets required
    code changes). Values parse as JSON; bare strings need no quotes.
    Unknown keys raise (catches typos against the preset inventory).
    """
    import json

    for item in overrides:
        key, sep, raw = item.partition("=")
        if not sep:
            raise ValueError(f"config override expects KEY=JSON, got {item!r}")
        if key not in cfg:
            raise KeyError(f"unknown config key {key!r}")
        try:
            cfg[key] = json.loads(raw)
        except json.JSONDecodeError:
            # the bare-string convenience (preprocessing_type=caffe) must
            # not swallow MALFORMED structured values — a truncated
            # '[[256,256]' stored as a string fails far downstream with an
            # unrelated-looking shape error
            if raw[:1] in "[{\"'0123456789-" or raw == "":
                raise ValueError(
                    f"config override {key}={raw!r} is not valid JSON "
                    "(quote bare strings only; lists/dicts/numbers must "
                    "parse)"
                )
            cfg[key] = raw
    return cfg
