"""Multi-chip machinery: device meshes, dataset-sharded score machines."""

from .mesh import data_spec, make_mesh, replicate, shard_batch
from .sharded_score import (
    ShardedIdealScoreModule,
    ShardedLocalEquivBordersScoreModule,
    ShardedLocalEquivScoreModule,
    ShardedLocalScoreModule,
    merge_collective,
    shard_dataset,
)

__all__ = [
    "make_mesh",
    "data_spec",
    "shard_batch",
    "replicate",
    "ShardedIdealScoreModule",
    "ShardedLocalScoreModule",
    "ShardedLocalEquivScoreModule",
    "ShardedLocalEquivBordersScoreModule",
    "merge_collective",
    "shard_dataset",
]
