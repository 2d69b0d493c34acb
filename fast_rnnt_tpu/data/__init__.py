from ..csrc import fbank_cpu
from .features import StreamingFbank
from .loader import BatchPlan, RaggedBatcher, collate_batch, prefetch

__all__ = [
    "BatchPlan",
    "RaggedBatcher",
    "StreamingFbank",
    "collate_batch",
    "fbank_cpu",
    "prefetch",
]
