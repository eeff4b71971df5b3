from .alias import AliasSampler, build_alias_tables
from .walk import sample_paths, sample_epoch, PathSampler
from .distance import bfs_distance_table, bfs_distance_table_host, membership_dists

__all__ = [
    "AliasSampler",
    "build_alias_tables",
    "sample_paths",
    "sample_epoch",
    "PathSampler",
    "bfs_distance_table",
    "membership_dists",
    "bfs_distance_table_host",
]
