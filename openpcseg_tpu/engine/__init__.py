from .task import SegTask, TrainState, default_caps  # noqa: F401
