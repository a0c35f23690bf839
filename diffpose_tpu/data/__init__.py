from diffpose_tpu.data.h36m import Human36mDataset, TRAIN_SUBJECTS, TEST_SUBJECTS
from diffpose_tpu.data.pipeline import (
    read_3d_data,
    create_2d_data,
    fetch,
    FlatDataset,
    flatten_sequences,
)
from diffpose_tpu.data.gmm import sample_gmm_batch
from diffpose_tpu.data.synthetic import make_synthetic_dataset
from diffpose_tpu.data.loader import BatchLoader

__all__ = [
    "Human36mDataset",
    "TRAIN_SUBJECTS",
    "TEST_SUBJECTS",
    "read_3d_data",
    "create_2d_data",
    "fetch",
    "FlatDataset",
    "flatten_sequences",
    "sample_gmm_batch",
    "make_synthetic_dataset",
    "BatchLoader",
    "BatchLoader",
]
