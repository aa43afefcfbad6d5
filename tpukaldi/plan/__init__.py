from .planner import (  # noqa: F401
    ChunkTask,
    EpochPlan,
    ExperimentPlan,
    build_plan,
    split_chunks,
    validation_points,
)
