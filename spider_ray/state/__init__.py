from .bloom import BloomFilter  # noqa: F401
from .cuckoo import CuckooFilter  # noqa: F401
