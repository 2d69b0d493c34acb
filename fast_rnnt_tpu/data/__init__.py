from .loader import BatchPlan, RaggedBatcher, collate_batch

__all__ = ["BatchPlan", "RaggedBatcher", "collate_batch"]
