from ..csrc import fbank_cpu
from .loader import BatchPlan, RaggedBatcher, collate_batch, prefetch

__all__ = [
    "BatchPlan",
    "RaggedBatcher",
    "collate_batch",
    "fbank_cpu",
    "prefetch",
]
