from phenaki_tpu.data.datasets import (
    ImageDataset,
    VideoDataset,
    DataLoader,
    collate_tensors_and_strings,
    cast_num_frames,
)
from phenaki_tpu.data.codecs import (
    video_tensor_to_gif,
    gif_to_tensor,
    video_to_tensor,
    tensor_to_video,
    crop_center,
)

__all__ = [
    "ImageDataset",
    "VideoDataset",
    "DataLoader",
    "collate_tensors_and_strings",
    "cast_num_frames",
    "video_tensor_to_gif",
    "gif_to_tensor",
    "video_to_tensor",
    "tensor_to_video",
    "crop_center",
]
