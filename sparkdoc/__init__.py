"""sparkdoc — a PySpark-native document-to-structured-content extraction engine.

From-scratch build with the data-processing capabilities of
docling-project/docling-graph, re-expressed Spark-first: DataFrame/SQL
operators wherever the semantics are relational, vectorized pandas/Arrow UDFs
for the sequence-dependent per-document logic (chunking, XY-cut reading
order), never per-row Python UDFs.

Modules (see SURVEY.md §7.4):
  schemas     StructTypes for documents/raw_nodes/chunks/nodes/edges/ledger
  session     SparkSession factory with scale-tuned defaults
  synth       seeded deterministic synthetic interleaved-document corpus
  clean       sanitize, markup strip, boilerplate/furniture heuristics
  layout      bbox normalization, 512-grid quantization, XY-cut reading order
  spans       span emission pipeline (the golden-surface extract job)
  chunker     structure-preserving chunking + re-split cascade + metadata
  identity    unicode normalizers, blake2b fingerprints, node ids
  dedup       content-hash dedup, alias containment, cardinality bounds
  graph       nodes/edges assembly, cleaner, stats
  provenance  ledger, verbatim anchor scan, compact views
  textops     language-ID, quality scoring, token counting, fingerprints
  dedup_text  exact / MinHash-LSH / SimHash / n-gram-Jaccard document dedup
  similarity  embedding cosine top-k (brute force + LSH-bucketed)
  io          exporters (CSV/JSON/Cypher), parquet in/out
  checkpoint  per-partition commit manifest + resume
  jobs        spark-submit entrypoints
"""

__version__ = "0.1.0"
