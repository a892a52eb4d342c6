from . import rle

__all__ = ['rle']
