"""Built-in frame/stream kernels (Scanner's in-repo op set, numpy-native).

Reference kernels: Histogram / OpticalFlow / Resize / Blur /
TestIncrementBounded / TestIncrementUnbounded
(/root/reference/tests/test_ops.cpp:13-338) and ImageEncoder
(/root/reference/scanner/util/image_encoder.cpp:112-117).  OpenCV is not
available in this container, so each kernel is implemented directly in
numpy inside Arrow batches; ImageEncoder emits PNG via a dependency-free
encoder (zlib is stdlib).
"""

from scanner_spark.kernels.image import (
    histogram_op,
    resize_op,
    blur_op,
    optical_flow_op,
    image_encoder_op,
)
from scanner_spark.kernels.stateful import (
    IncrementBounded,
    IncrementUnbounded,
    increment_bounded_op,
    increment_unbounded_op,
)

__all__ = [
    "histogram_op",
    "resize_op",
    "blur_op",
    "optical_flow_op",
    "image_encoder_op",
    "IncrementBounded",
    "IncrementUnbounded",
    "increment_bounded_op",
    "increment_unbounded_op",
]
