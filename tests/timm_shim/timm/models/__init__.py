from . import layers, swin_transformer, vision_transformer  # noqa: F401
