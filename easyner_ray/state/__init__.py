"""Stateful surfaces: resumable partitioned Parquet sink with per-partition
lineage manifests and checkpoint markers."""
