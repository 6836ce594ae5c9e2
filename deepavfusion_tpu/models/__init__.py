from . import layers, vit, fusion_blocks, deepavfusion, avmae  # noqa: F401
