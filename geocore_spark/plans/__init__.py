"""Pipeline plumbing: per-partition lineage metrics, checkpoint/resume."""
