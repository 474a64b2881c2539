from ceres_mono_orb_slam2_tpu.ops.orb.extractor import ORBExtractor, FrameFeatures  # noqa: F401
from ceres_mono_orb_slam2_tpu.ops.orb.pattern import BIT_PATTERN_31  # noqa: F401
