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
