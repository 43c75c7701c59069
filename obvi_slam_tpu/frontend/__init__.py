from obvi_slam_tpu.frontend.visual_features import VisualFeatureFrontend  # noqa: F401
