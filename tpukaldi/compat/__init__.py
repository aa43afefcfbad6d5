"""Reference-checkpoint compatibility (lazy imports so that
`python -m tpukaldi.compat.torch_import` doesn't double-import)."""


def __getattr__(name):
    if name in (
        "convert_checkpoint_file",
        "import_model_par",
        "main",
        "convert_pase_checkpoint",
        "convert_pase_checkpoint_file",
    ):
        from . import torch_import

        return getattr(torch_import, name)
    raise AttributeError(name)
