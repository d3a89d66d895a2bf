from . import linalg
from .linalg import LUSolver, factorize, solve_refined

__all__ = ["linalg", "LUSolver", "factorize", "solve_refined"]
