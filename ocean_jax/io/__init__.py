from . import artifacts, checkpoint, plots
from .artifacts import RunDirectory

__all__ = ["artifacts", "checkpoint", "plots", "RunDirectory"]
