from .dataset import ECGSemiSegDataset, build_seg_dataset  # noqa: F401
from .loader import DataLoader, get_dataloader  # noqa: F401
