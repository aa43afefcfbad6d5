from .kaldi_io import (  # noqa: F401
    ArkScpWriter,
    KaldiIOError,
    open_or_fd,
    read_key,
    read_mat,
    read_mat_ark,
    read_mat_scp,
    read_scp_entries,
    read_vec_flt,
    read_vec_flt_ark,
    read_vec_flt_scp,
    read_vec_int,
    read_vec_int_ark,
    write_mat,
    write_vec_flt,
    write_vec_int,
)
from .feats import (  # noqa: F401
    add_deltas,
    apply_cmvn,
    chunk_cmvn,
    compute_cmvn_stats,
    load_counts,
    read_cmvn_stats,
    save_counts,
    splice,
)
from .pipeline import apply_pipeline, parse_pipeline  # noqa: F401
