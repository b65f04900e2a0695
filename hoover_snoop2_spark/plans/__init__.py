"""Pipeline drivers: the end-to-end extraction DAG, checkpoint/resume,
skew-aware repartitioning and per-stage metrics."""
