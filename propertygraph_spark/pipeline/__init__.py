"""Spark-side plumbing: fused extraction stage, entity linking,
connected-components canonicalization, partitioned materialization with
manifest-based checkpoint/resume."""
