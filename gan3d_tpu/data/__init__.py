"""npz volume data pipeline.

Reference equivalents: data_handler.py (DATA, DATA_DIR), the torch DataLoader
plumbing in trainer.py:84,95-98, make_dir_dataset.py, and real_ims.py.
"""

from gan3d_tpu.data.datasets import NpzDataset, NpzDirDataset, make_dir_dataset
from gan3d_tpu.data.loader import Loader

__all__ = ["NpzDataset", "NpzDirDataset", "make_dir_dataset", "Loader"]
