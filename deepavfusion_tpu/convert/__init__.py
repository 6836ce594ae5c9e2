from . import torch2jax  # noqa: F401
