from . import subscale

__all__ = ["subscale"]
