"""deepee_spark — a PySpark-native event-centric KG-construction engine.

Re-realizes the dataflow semantics of the zjunlp/DeepEE event-extraction
gallery (reference at /root/reference, read-only) as an idiomatic Spark
pipeline: DataFrame/SQL plans, Arrow-batched pandas UDF inference kernels,
broadcast dimension joins, salted skew joins, and stage-checkpointed
resumable execution.

This is NOT a port: the reference is single-machine TF/PyTorch research
code; every operator here is declared against Catalyst so predicate
pushdown, column pruning, partial aggregation and AQE apply.

Package layout (SURVEY.md §7):
    session     SparkSession factory tuned for the target scale
    ontology    ACE-2005-style event schema (MOGANED/consts.py lineage)
    corpus      deterministic synthetic Common-Crawl-style corpus generator
    extract     boilerplate-stripping text extraction (byte-identical oracle)
    segment     language-gated sentence segmentation
    functions/  column-expression featurization (SC9-SC16) + shared hashes
    operators/  relational/set/agg operators (A*, J*, W*, U*, SC*)
    kernels/    NumPy forward-pass inference kernels (M1/M2-style)
    plans/      the documents→triples stage DAG with checkpoint/resume
    sources/    table IO abstraction (parquet stage catalog, Iceberg-ready)
"""

__version__ = "0.1.0"
