"""Dataset configs. `get_config(name)` mirrors the reference's per-dataset
easydict modules (`/root/reference/configs/config_*.py`) selected by the
`-n` CLI flag (train.py:42-51)."""

from configs.base import Config, get_config

__all__ = ["Config", "get_config"]
