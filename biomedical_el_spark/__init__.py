"""biomedical_el_spark — a PySpark-native entity-resolution / record-linkage
engine with the query and data-processing capabilities of
kingsaint/BioMedical-EL, re-expressed as idiomatic distributed Spark.

The reference (a single-process PyTorch entity-linking system) computes:
candidate generation (→ our *blocking*), dual-encoder dot-product linking
(→ our *pairwise scoring*), and mention→entity assignment (→ our
*transitive clustering*).  See SURVEY.md for the full operator mapping.

Layout:
    functions/   column-level helpers (shingles, minhash, similarity, embedder)
    operators/   dataflow stages (blocking, pairs, scoring, cc, dedup, ann, ...)
    sources/     readers/writers (pages table, stage snapshots)
    datagen/     deterministic synthetic page corpus with known gold clusters
    plans/       end-to-end pipelines (flagship linkage job)
    streaming/   structured-streaming incremental ingest (optional path)
"""

__version__ = "0.1.0"
