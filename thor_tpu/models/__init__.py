"""Flagship jittable pipelines built from thor_tpu.ops."""
from .pipeline import (decode_inter_frame_16, make_example,  # noqa: F401
                       multi_stream_step)
