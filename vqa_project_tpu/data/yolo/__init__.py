from vqa_project_tpu.data.yolo.augment import (
    augment_hsv,
    cutout,
    letterbox,
    mixup,
    mosaic4,
    random_perspective,
)
from vqa_project_tpu.data.yolo.loaders import (
    ImageLabelDataset,
    InfiniteBatcher,
    LoadImages,
    LoadStreams,
    LoadWebcam,
    get_yolo_dataset,
)

__all__ = [
    "augment_hsv", "cutout", "letterbox", "mixup", "mosaic4",
    "random_perspective",
    "ImageLabelDataset", "InfiniteBatcher", "LoadImages", "LoadStreams",
    "LoadWebcam", "get_yolo_dataset",
]
