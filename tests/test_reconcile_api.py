"""OpenRefine reconciliation client (reference lib/reconcile.py +
template_support.py:482-530): batched transport wire format, match
semantics, proxy-concept triples and rec:possibleMatch annotations.

The stub transport runs inside Spark's Python WORKER processes (mapInPandas)
— call capture therefore goes through a log file, not driver memory.
"""

import base64
import functools
import hashlib
import json

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.reconcile import (
    REC_LABEL,
    REC_MATCH,
    REC_POSSIBLE_MATCH,
    REC_SCORE,
    reconcile_keys,
)
from rdf_mapper_spark.spec import SKOS, MappingSpec

from tests.conftest import quads_of_df, rows_to_df

XSD = "http://www.w3.org/2001/XMLSchema#"


def _sha1_b32hex(s: str) -> str:
    return base64.b32hexencode(hashlib.sha1(s.encode()).digest()).decode()


# -- transport stub: an in-test reconciliation service ----------------------
_SERVICE = {
    "acme": [{"id": "http://kg.example.org/entity/acme", "name": "ACME",
              "score": 99.0, "match": True}],
    "globex": [
        {"id": "http://kg.example.org/entity/globex", "name": "Globex",
         "score": 71.5, "match": False},
        {"id": "http://kg.example.org/entity/globexx", "name": "GlobexX",
         "score": 33.0, "match": False},
    ],
    # two candidates both flagged match=True: NOT a confident match
    # (reference MatchResult requires exactly one entry)
    "initech": [
        {"id": "http://kg.example.org/entity/initech1", "match": True},
        {"id": "http://kg.example.org/entity/initech2", "match": True},
    ],
}


def recording_transport(log_path: str, endpoint: str, batch: dict) -> dict:
    with open(log_path, "a") as f:
        f.write(json.dumps({"endpoint": endpoint, "batch": batch}) + "\n")
    return {i: {"result": _SERVICE.get(q["query"], [])}
            for i, q in batch.items()}


def _transport(tmp_path):
    log = str(tmp_path / "calls.jsonl")
    return functools.partial(recording_transport, log), log


def _queries_logged(log: str) -> list[dict]:
    out = []
    try:
        with open(log) as f:
            for line in f:
                out.extend(json.loads(line)["batch"].values())
    except FileNotFoundError:
        pass
    return out


def test_reconcile_keys_wire_and_match_semantics(spark, tmp_path):
    transport, log = _transport(tmp_path)
    keys = spark.createDataFrame(
        [("acme",), ("globex",), ("initech",), ("nowhere",)], ["key"]
    )
    rows = {r.key: r for r in reconcile_keys(
        keys, "http://svc/reconcile", keytype="http://t/Org",
        filters=[("http://p/in", "http://v/scheme")],
        transport=transport,
    ).collect()}
    assert rows["acme"].match_id == "http://kg.example.org/entity/acme"
    assert rows["globex"].match_id is None
    assert [p.id for p in rows["globex"].possible] == [
        "http://kg.example.org/entity/globex",
        "http://kg.example.org/entity/globexx",
    ]
    # >1 match=True entries -> no confident match (reconcile.py:70-73)
    assert rows["initech"].match_id is None
    assert len(rows["initech"].possible) == 2
    assert rows["nowhere"].match_id is None and rows["nowhere"].possible == []
    # wire format parity (reconcile.py:25-35)
    q = next(q for q in _queries_logged(log) if q["query"] == "acme")
    assert q["type"] == "http://t/Org"
    assert q["properties"] == [{"pid": "http://p/in", "v": "http://v/scheme"}]


_BASE = "https://ex.org/kg"


def _run_engine(spark, rows, transport,
                template="{org | reconcile('orgname')}", **engine_kw):
    spec_dict = {
        "globals": {"$datasetBase": _BASE,
                    "$reconciliationAPI": "http://svc/reconcile"},
        "resources": [{"name": "T", "properties": {
            "@id": "<https://ex.org/kg/data/T/{id}>",
            "p": template,
        }}],
    }
    engine = MapperEngine(MappingSpec(spec_dict, auto_declare=False),
                          reconcile_transport=transport, **engine_kw)
    q = engine.apply(rows_to_df(spark, rows), file_name="file")
    return quads_of_df(q)


def test_reconcile_api_match_and_proxy_quads(spark, tmp_path):
    transport, _ = _transport(tmp_path)
    quads = _run_engine(spark, [
        {"id": "1", "org": "acme"},
        {"id": "2", "org": "globex"},
    ], transport)
    by_pred = {}
    for q in quads:
        by_pred.setdefault(q.p, []).append(q)
    # matched key -> the service IRI, straight substitution
    p_objs = {q.s.value: q.o.value for q in by_pred[_BASE + "/def/p"]}
    assert p_objs[_BASE + "/data/T/1"] == "http://kg.example.org/entity/acme"
    # unmatched key -> deterministic proxy under /data/{name}/ with
    # hash(key + keytype) (template_support.py:476-480)
    proxy = (_BASE + "/data/orgname/"
             + _sha1_b32hex("globex" + SKOS + "Concept"))
    assert p_objs[_BASE + "/data/T/2"] == proxy
    # proxy concept's own triples: @type keytype + skos:prefLabel key
    types = {(q.s.value, q.o.value) for q in by_pred[
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]}
    assert (proxy, SKOS + "Concept") in types
    labels = {(q.s.value, q.o.value) for q in by_pred[SKOS + "prefLabel"]}
    assert (proxy, "globex") in labels
    # rec:possibleMatch annotations: one bnode per candidate with
    # score/match/label (reconcile.py MatchEntry.record_as_rdf)
    pm = [q for q in by_pred[REC_POSSIBLE_MATCH] if q.s.value == proxy]
    assert len(pm) == 2
    assert all(q.o.kind == "bnode" for q in pm)
    bnodes = {q.o.value for q in pm}
    matches = {q.s.value: q.o.value for q in by_pred[REC_MATCH]}
    assert set(matches.values()) == {
        "http://kg.example.org/entity/globex",
        "http://kg.example.org/entity/globexx",
    }
    scores = {q.o.value: q.o.datatype for q in by_pred[REC_SCORE]}
    assert scores == {"71.5": XSD + "decimal", "33.0": XSD + "decimal"}
    names = {q.o.value for q in by_pred[REC_LABEL]}
    assert names == {"Globex", "GlobexX"}
    assert bnodes  # annotations hang off real bnodes


def test_reconcile_alias_map_preempts_api(spark, tmp_path):
    # alias map hit must not be queried against the API
    transport, log = _transport(tmp_path)
    quads = _run_engine(
        spark,
        [{"id": "1", "org": "acme"}, {"id": "2", "org": "globex"}],
        transport,
        alias_map={"acme": "http://local.example/acme"},
    )
    objs = {x.s.value: x.o.value for x in quads if x.p == _BASE + "/def/p"}
    assert objs[_BASE + "/data/T/1"] == "http://local.example/acme"
    queried = {q["query"] for q in _queries_logged(log)}
    assert "acme" not in queried and "globex" in queried


def test_reconcile_skip_placeholders_drops_unmatched(spark, tmp_path):
    transport, _ = _transport(tmp_path)
    quads = _run_engine(
        spark,
        [{"id": "1", "org": "acme"}, {"id": "2", "org": "globex"}],
        transport,
        template="{org | reconcile('orgname', 'None', 'None', 'true')}",
    )
    subj_with_p = {q.s.value for q in quads if q.p == _BASE + "/def/p"}
    assert _BASE + "/data/T/1" in subj_with_p
    assert _BASE + "/data/T/2" not in subj_with_p  # unmatched -> no triple
    assert not any(q.p == REC_POSSIBLE_MATCH for q in quads)


def test_reconcile_filters_from_prop_def(spark, tmp_path):
    transport, log = _transport(tmp_path)
    spec_dict = {
        "globals": {"$datasetBase": _BASE,
                    "$reconciliationAPI": "http://svc/reconcile"},
        "namespaces": {"t": "http://t/"},
        "properties": [{
            "name": "orgname",
            "prop": "<{$datasetBase}/def/p>",
            "class": "t:Org",
            "reconciliationType": "t:Org",
            "reconciliationFilters": {"t:inScheme": "t:Orgs"},
        }],
        "resources": [{"name": "T", "properties": {
            "@id": "<https://ex.org/kg/data/T/{id}>",
            ":orgname": "{org}",
        }}],
    }
    engine = MapperEngine(MappingSpec(spec_dict, auto_declare=False),
                          reconcile_transport=transport)
    engine.apply(rows_to_df(spark, [{"id": "1", "org": "acme"}]),
                 file_name="file").count()
    q = next(qq for qq in _queries_logged(log) if qq["query"] == "acme")
    assert q["type"] == "http://t/Org"
    assert q["properties"] == [{"pid": "http://t/inScheme",
                                "v": "http://t/Orgs"}]


def test_reconcile_run_wide_cache_one_call_per_key(spark, tmp_path):
    """Two props reconciling overlapping keys -> each key queried ONCE
    (reference TemplateState.reconcile_cache, template_state.py:71-78)."""
    transport, log = _transport(tmp_path)
    spec_dict = {
        "globals": {"$datasetBase": _BASE,
                    "$reconciliationAPI": "http://svc/reconcile"},
        "resources": [{"name": "T", "properties": {
            "@id": "<https://ex.org/kg/data/T/{id}>",
            "p": "{org | reconcile('orgname')}",
            "q": "{org2 | reconcile('orgname2')}",
        }}],
    }
    engine = MapperEngine(MappingSpec(spec_dict, auto_declare=False),
                          reconcile_transport=transport)
    quads = quads_of_df(engine.apply(rows_to_df(spark, [
        {"id": "1", "org": "acme", "org2": "acme"},      # overlap
        {"id": "2", "org": "globex", "org2": "initech"},
    ]), file_name="file"))
    queried = [q["query"] for q in _queries_logged(log)]
    assert sorted(queried) == ["acme", "globex", "initech"], queried
    # cached verdicts still resolve at the second site
    objs = {(x.s.value, x.p): x.o.value for x in quads}
    assert objs[(_BASE + "/data/T/1", _BASE + "/def/p")] == \
        "http://kg.example.org/entity/acme"
    assert objs[(_BASE + "/data/T/1", _BASE + "/def/q")] == \
        "http://kg.example.org/entity/acme"
    # unmatched cached key -> per-site proxy (namespaced by call-site name)
    assert objs[(_BASE + "/data/T/2", _BASE + "/def/q")] == (
        _BASE + "/data/orgname2/" + _sha1_b32hex("initech" + SKOS + "Concept")
    )


def test_reconcile_cache_distinct_keytype_not_shared(spark, tmp_path):
    """Different reconciliation type -> different cache slot -> re-query."""
    transport, log = _transport(tmp_path)
    spec_dict = {
        "globals": {"$datasetBase": _BASE,
                    "$reconciliationAPI": "http://svc/reconcile"},
        "namespaces": {"t": "http://t/"},
        "resources": [{"name": "T", "properties": {
            "@id": "<https://ex.org/kg/data/T/{id}>",
            "p": "{org | reconcile('a')}",
            "q": "{org | reconcile('b', 't:Org')}",
        }}],
    }
    engine = MapperEngine(MappingSpec(spec_dict, auto_declare=False),
                          reconcile_transport=transport)
    engine.apply(rows_to_df(spark, [{"id": "1", "org": "acme"}]),
                 file_name="file").count()
    calls = _queries_logged(log)
    assert len([c for c in calls if c["query"] == "acme"]) == 2
    types = {json.dumps(c.get("type")) for c in calls}
    assert len(types) == 2  # one untyped, one t:Org


def test_reconcile_broadcast_join_path(spark, monkeypatch):
    """Above _RECONCILE_BROADCAST_MIN resolved keys the lookup compiles to
    a left BroadcastHashJoin, not a closure UDF; values unchanged."""
    from rdf_mapper_spark.compiler import resources as res_mod

    alias_map = {
        "acme": "http://local.example/acme",
        "globex": "http://local.example/globex",
        "hooli": "http://local.example/hooli",
    }
    rows = [{"id": "1", "org": "acme"}, {"id": "2", "org": "globex"},
            {"id": "3", "org": "unknowncorp"}]

    def run():
        spec_dict = {
            "globals": {"$datasetBase": _BASE},
            "resources": [{"name": "T", "properties": {
                "@id": "<https://ex.org/kg/data/T/{id}>",
                "p": "{org | reconcile('orgname')}",
            }}],
        }
        engine = MapperEngine(MappingSpec(spec_dict, auto_declare=False),
                              alias_map=alias_map)
        return engine.apply(rows_to_df(spark, rows), file_name="file")

    baseline = {(q.s.value, q.o.value) for q in quads_of_df(run())}
    monkeypatch.setattr(res_mod, "_RECONCILE_BROADCAST_MIN", 1)
    joined_df = run()
    plan = joined_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert {(q.s.value, q.o.value) for q in quads_of_df(joined_df)} \
        == baseline
