from ._unavailable import make_getattr

__getattr__ = make_getattr("r2plus1d")
