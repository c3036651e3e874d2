from .defaults import Config
from .loader import load_config

__all__ = ["Config", "load_config"]
