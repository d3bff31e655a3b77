from llp_tpu.utils.config import TeacherConfig, StudentConfig, SplitConfig
from llp_tpu.utils.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "TeacherConfig",
    "StudentConfig",
    "SplitConfig",
    "save_checkpoint",
    "load_checkpoint",
]
