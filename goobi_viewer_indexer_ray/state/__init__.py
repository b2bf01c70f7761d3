"""Durable job state: per-partition lineage manifests + resume logic."""
