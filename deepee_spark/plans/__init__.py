"""Stage DAG: documents -> ... -> triples, checkpointed and resumable."""
