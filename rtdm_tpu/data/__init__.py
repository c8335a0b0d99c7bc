from rtdm_tpu.data.aider import AiderDataset, BatchLoader, normalize_batch

__all__ = ["AiderDataset", "BatchLoader", "normalize_batch"]
