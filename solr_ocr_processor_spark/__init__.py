"""solr_ocr_processor_spark — a from-scratch PySpark-native full-text
indexing + BM25 search engine with the capabilities of
hatfieldlibrary/solr_ocr_processor (reference at /root/reference/).

The reference is a Go microservice that prepares OCR page documents
(stable ordering, dense positional ordinals, per-word coordinate
payloads) and delegates tokenization / inverted indexing / BM25
ranking / highlight coordinates to Solr + solr-ocrhighlighting.
This package owns BOTH halves, Spark-first:

- ingest analog  -> plans.materialize   (dense ordinals, char-offset
  payloads, deterministic doc ids; reference app/handler/indexer.go:81-148)
- engine analog  -> operators.build / operators.score  (SPIMI posting
  blocks, delta+varint compression, block-max WAND BM25 top-k — the
  part Solr did for the reference)
- lifecycle      -> operators.lifecycle  (add / membership check /
  delete-by-query; reference app/process/solr.go:21-202)
- training-data ops -> operators.dedup / similarity / textstats /
  multimodal (scale-out extras a 100 TB corpus pipeline needs)
"""

__version__ = "0.1.0"
