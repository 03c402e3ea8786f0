from crfr.ops.bicubic import degrade_updown, resize_bicubic, resize_matrix  # noqa: F401
from crfr.ops.normalize import denormalize, normalize  # noqa: F401
from crfr.ops.similarity import (  # noqa: F401
    REFERENCE_LANDMARKS_112,
    similarity_transform,
    umeyama_transform,
)
from crfr.ops.warp import warp_affine  # noqa: F401
