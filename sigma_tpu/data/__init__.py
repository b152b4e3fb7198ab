from sigma_tpu.data.dataset import RGBXDataset
from sigma_tpu.data.transforms import TrainPre, ValPre, normalize
from sigma_tpu.data.loader import TrainLoader

__all__ = ["RGBXDataset", "TrainPre", "ValPre", "normalize", "TrainLoader"]
