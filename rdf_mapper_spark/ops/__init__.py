"""Large-scale training-data operators (dedup, similarity, text, multimodal).

These extend the KG engine with the operations a 100 TB web-text pipeline
needs around it; each has a `queries()` entry + DuckDB oracle in
__spark_entry__ (or a documented rows-only check where SQL cannot express
the op).
"""
