from .bloom import BloomFilter, constrain_bloom
from .cms import CountMinSketch, params_from_error
from .hll import HyperLogLog

__all__ = [
    "BloomFilter",
    "CountMinSketch",
    "HyperLogLog",
    "constrain_bloom",
    "params_from_error",
]
