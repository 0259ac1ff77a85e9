"""TPU-native object detection framework (JAX / XLA / Pallas).

Public API mirrors the reference's factory surface:

    from tf_eager_object_detection_tpu import (
        config_factory, model_factory, dataset_factory,
    )
"""


def config_factory(data_type, model_type):
    from tf_eager_object_detection_tpu.config.config_factory import (
        config_factory as f,
    )

    return f(data_type, model_type)


def model_factory(model_type, backbone, config):
    from tf_eager_object_detection_tpu.models.model_factory import (
        model_factory as f,
    )

    return f(model_type, backbone, config)


def dataset_factory(dataset_type, mode, configs):
    from tf_eager_object_detection_tpu.data.dataset_factory import (
        dataset_factory as f,
    )

    return f(dataset_type, mode, configs)


__all__ = ["config_factory", "model_factory", "dataset_factory"]
__version__ = "0.1.0"
