from .run_exp import run_experiment  # noqa: F401
from .tune_hyperparameters import generate_tuning_cfgs  # noqa: F401
from .metrics import create_curves, export_txt, parse_res  # noqa: F401
from .save_raw_fea import dump_raw_features  # noqa: F401
