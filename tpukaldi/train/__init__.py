from .checkpoint import load_all, load_checkpoint, save_all, save_checkpoint  # noqa: F401
from .chunk_runtime import ChunkResult, ChunkRuntime, read_info, write_info  # noqa: F401
from .optimizers import make_all_optimizers, make_optimizer, set_lr  # noqa: F401
from .step import make_eval_step, make_forward_step, make_train_step  # noqa: F401
