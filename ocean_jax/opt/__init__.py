from .driver import run_gradient_descent, GDRunResult
from . import grad_check

__all__ = ["run_gradient_descent", "GDRunResult", "grad_check"]
