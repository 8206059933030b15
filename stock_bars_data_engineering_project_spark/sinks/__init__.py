from .checkpoint import CHECKPOINT_TABLE, get_checkpoint, save_checkpoint
from .warehouse import ParquetWarehouse

__all__ = ["CHECKPOINT_TABLE", "ParquetWarehouse", "get_checkpoint", "save_checkpoint"]
