from .bloom import BloomFilter, constrain_bloom
from .cms import CountMinSketch, params_from_error
from .hll import HyperLogLog
from .kmv import KMV
from .mg import MisraGries

__all__ = [
    "BloomFilter",
    "CountMinSketch",
    "HyperLogLog",
    "KMV",
    "MisraGries",
    "constrain_bloom",
    "params_from_error",
]
