"""Column-level functions: tokenization, shingling, hashing, similarity,
embedding.  Everything here is either a pure `pyspark.sql.functions`
expression builder (JVM-side, codegen'd, Catalyst-optimizable) or an
Arrow-batched pandas UDF (never per-row Python)."""
