"""Web-scale KG-construction pipeline (BASELINE.json north rule).

pages (url, warc_ts, html, text, lang)
  -> extract   (vectorized Arrow UDF; byte-identical per url)
  -> mentions  (n-gram candidates x broadcast alias dictionary)
  -> link      (entity linking + deterministic proxy minting)
  -> triples   (candidate quads via the template engine)
  -> canonicalize (salted dedup + connected-components entity clustering)
  -> materialize  (partitioned graph tables / N-Quads)

Each stage checkpoints to a parquet "stage table" with per-partition lineage
and triple-count metrics; re-running skips completed stages.
"""
