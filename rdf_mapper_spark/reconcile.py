"""OpenRefine-style reconciliation API client (reference: lib/reconcile.py).

Spark-first shape (SURVEY §2.5 T19): the engine never fires one HTTP call
per row.  Distinct keys are extracted from the input DataFrame, the batched
POSTs run inside `mapInPandas` on the executors (so request fan-out scales
with partitions), and the small (dictionary-sized) result set is collected /
broadcast back into the compiled plan.

The transport is injectable — tests stub it with a plain function; the
default is a stdlib urllib POST matching the reference wire format
(reconcile.py:25-43): form field ``queries=json.dumps({i: {query, type?,
properties?}})`` -> JSON response ``{i: {"result": [...]}}``.

Match semantics replicate reference MatchResult (reconcile.py:70-76): a
result list with exactly one entry whose ``match`` flag is true is a match;
anything else is a non-match whose entries become ``rec:possibleMatch``
annotations on the minted proxy concept.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

RECONCILIATION_VOCAB = "http://epimorphics.net/vocabs/reconciliation/"
REC_POSSIBLE_MATCH = RECONCILIATION_VOCAB + "possibleMatch"
REC_SCORE = RECONCILIATION_VOCAB + "score"
REC_MATCH = RECONCILIATION_VOCAB + "match"
REC_LABEL = RECONCILIATION_VOCAB + "label"

#: transport(endpoint, batch) -> parsed JSON response dict
Transport = Callable[[str, dict], dict]

RESULT_SCHEMA = StructType([
    StructField("key", StringType()),
    StructField("match_id", StringType()),  # null => no confident match
    StructField("possible", ArrayType(StructType([
        StructField("id", StringType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]))),
])


def http_transport(endpoint: str, batch: dict) -> dict:
    """POST one reconciliation batch (reference reconcile.py:36-40)."""
    data = urllib.parse.urlencode({"queries": json.dumps(batch)}).encode()
    req = urllib.request.Request(endpoint, data=data, method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        body = resp.read()
        if resp.status != 200:
            raise ValueError(
                f"Failure using reconciliation service {resp.status} {body!r}"
            )
        return json.loads(body.decode("utf-8"))


def _query_batch(chunk: list[str], keytype: str | None,
                 filters: Sequence[tuple[str, str]]) -> dict:
    batch: dict[str, dict] = {}
    for i, key in enumerate(chunk):
        q: dict = {"query": key}
        if keytype:
            q["type"] = keytype
        if filters:
            q["properties"] = [{"pid": p, "v": v} for p, v in filters]
        batch[str(i)] = q
    return batch


def _classify(result: list | None) -> tuple[str | None, list[dict]]:
    """MatchResult semantics: (match_id, possible_matches)."""
    entries = result or []
    if len(entries) == 1 and entries[0].get("match"):
        return str(entries[0].get("id")), []
    return None, [
        {"id": str(e.get("id")), "name": e.get("name"),
         "score": float(e["score"]) if e.get("score") is not None else None}
        for e in entries
    ]


def reconcile_keys(keys_df: DataFrame, endpoint: str,
                   keytype: str | None = None,
                   filters: Sequence[tuple[str, str]] = (),
                   transport: Transport | None = None,
                   batch_size: int = 25) -> DataFrame:
    """(key) -> (key, match_id, possible): batched HTTP inside mapInPandas.

    ``keys_df`` must have a single string column ``key`` (pre-distincted by
    the caller).  Each Arrow batch issues ceil(n/batch_size) POSTs; at scale
    repartition the key set to bound per-task latency.
    """
    tp = transport or http_transport
    filt = list(filters)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = [str(k) for k in pdf["key"]]
            match_ids: list[str | None] = []
            possibles: list[list[dict]] = []
            for off in range(0, len(keys), batch_size):
                chunk = keys[off:off + batch_size]
                resp = tp(endpoint, _query_batch(chunk, keytype, filt))
                results: list[list | None] = [None] * len(chunk)
                for k, match in resp.items():
                    results[int(k)] = (match or {}).get("result")
                for res in results:
                    mid, poss = _classify(res)
                    match_ids.append(mid)
                    possibles.append(poss)
            yield pd.DataFrame(
                {"key": keys, "match_id": match_ids, "possible": possibles}
            )

    return (
        keys_df.select(F.col("key").cast("string").alias("key"))
        .mapInPandas(run, RESULT_SCHEMA)
    )
