"""Data-parallel sharding over device meshes (frames are the DP axis)."""
from .mesh import (  # noqa: F401
    data_mesh,
    pad_frames_to_multiple,
    sharded_codec_step,
    sharded_decode_step,
    sharded_encode_step,
)
