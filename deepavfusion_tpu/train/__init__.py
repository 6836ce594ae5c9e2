from . import lr_sched, trainer  # noqa: F401
