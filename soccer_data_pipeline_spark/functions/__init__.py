from .scalars import cents, hash48, epoch_us, natural_version_key
from .vectors import dot, cosine, as_double_array

__all__ = [
    "cents",
    "hash48",
    "epoch_us",
    "natural_version_key",
    "dot",
    "cosine",
    "as_double_array",
]
