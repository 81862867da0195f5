from .encoding import StateEncoder
from .table import StateTable

__all__ = ["StateEncoder", "StateTable"]
