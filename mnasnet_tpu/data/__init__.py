from mnasnet_tpu.data.transforms import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    center_crop,
    eval_transform,
    normalize,
    random_resized_crop,
    resize_shorter,
    to_float_array,
    train_transform,
)
