from . import audio, pos_embed, masking, attention  # noqa: F401
