"""End-to-end Ray Data pipelines: docs build, index build, query, catalog."""
