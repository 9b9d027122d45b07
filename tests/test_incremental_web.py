"""Incremental quad delta (pipeline/incremental.py) and canonical URL
normalization (ops/web.py)."""

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.web import normalize_url
from rdf_mapper_spark.pipeline.incremental import apply_delta, quad_delta
from rdf_mapper_spark.quads import QUAD_FIELDS, quads_from_rows


def _q(g, s, p, o):
    return (g, "iri", s, p, "literal", o, None, None)


def _quadset(df):
    return {tuple(r) for r in df.select(*QUAD_FIELDS).collect()}


def test_quad_delta_add_delete_change(spark):
    old = quads_from_rows(spark, [
        _q(None, "s1", "p", "v1"),
        _q(None, "s2", "p", "v2"),
        _q("g1", "s3", "p", "v3"),
        _q(None, "s2", "p", "v2"),   # in-snapshot duplicate collapses
    ])
    new = quads_from_rows(spark, [
        _q(None, "s1", "p", "v1"),      # unchanged -> no delta row
        _q(None, "s2", "p", "v2b"),     # changed -> delete + add
        _q(None, "s4", "p", "v4"),      # new -> add
        # g1/s3 gone -> delete
    ])
    delta = quad_delta(old, new)
    rows = {(r["op"], r["s"], r["o"]) for r in delta.collect()}
    assert rows == {
        ("delete", "s2", "v2"),
        ("add", "s2", "v2b"),
        ("add", "s4", "v4"),
        ("delete", "s3", "v3"),
    }


def test_quad_delta_identity_is_empty(spark):
    snap = quads_from_rows(spark, [
        _q(None, "s1", "p", "v1"), _q("g", "s2", "p", "v2"),
    ])
    assert quad_delta(snap, snap).count() == 0


def test_apply_delta_reconstructs_new(spark):
    old = quads_from_rows(spark, [
        _q(None, "s1", "p", "v1"),
        _q(None, "s2", "p", "v2"),
        _q("g1", "s3", "p", "v3"),
    ])
    new = quads_from_rows(spark, [
        _q(None, "s1", "p", "v1"),
        _q(None, "s2", "p", "v2b"),
        _q(None, "s4", "p", "v4"),
    ])
    rebuilt = apply_delta(old, quad_delta(old, new))
    assert _quadset(rebuilt) == _quadset(new)


URL_VECTORS = [
    # lowercase scheme+host, keep path case
    ("HTTPS://WWW.Example.COM/Path/X", "https://www.example.com/Path/X"),
    # default ports dropped, non-default kept
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("http://a.com:8080/x", "http://a.com:8080/x"),
    ("https://a.com:80/x", "https://a.com:80/x"),
    # fragment stripped; empty path -> /
    ("http://a.com#frag", "http://a.com/"),
    # duplicate slashes collapse
    ("http://a.com//x///y", "http://a.com/x/y"),
    # tracking params dropped, rest sorted, empties dropped
    ("http://a.com/p?utm_source=t&b=2&a=1&fbclid=z", "http://a.com/p?a=1&b=2"),
    ("http://a.com/p?z=9&&y=2", "http://a.com/p?y=2&z=9"),
    # all params dropped -> no '?'
    ("http://a.com/p?utm_campaign=c&gclid=g", "http://a.com/p"),
    # 'ref' dropped but 'referrer' kept (prefix must match whole key)
    ("http://a.com/p?ref=r&referrer=keep", "http://a.com/p?referrer=keep"),
]


def test_normalize_url_vectors(spark):
    df = spark.createDataFrame([(r,) for r, _ in URL_VECTORS], ["u"])
    got = [r[0] for r in
           df.select(normalize_url(F.col("u"))).collect()]
    assert got == [want for _, want in URL_VECTORS]


def test_delta_script_executes_to_new_snapshot(spark):
    """End-to-end incremental path: old store + sparql_delta_script(delta)
    == new snapshot, including default-graph and named-graph quads and a
    changed-object (delete-then-insert) case."""
    from rdf_mapper_spark.sinks import sparql_delta_script
    from rdf_mapper_spark.turtle import canonical_quadset
    from rdf_mapper_spark.update_apply import apply_update_script

    from tests.conftest import quads_of_df

    old = quads_from_rows(spark, [
        _q(None, "http://ex.com/s1", "http://ex.com/p", "v1"),
        _q(None, "http://ex.com/s2", "http://ex.com/p", "v2"),
        _q("http://ex.com/g1", "http://ex.com/s3", "http://ex.com/p", "v3"),
    ])
    new = quads_from_rows(spark, [
        _q(None, "http://ex.com/s1", "http://ex.com/p", "v1"),
        _q(None, "http://ex.com/s2", "http://ex.com/p", "v2b"),   # changed
        _q("http://ex.com/g1", "http://ex.com/s4", "http://ex.com/p", "v4"),
    ])
    script = sparql_delta_script(quad_delta(old, new))
    assert "DELETE DATA" in script and "INSERT DATA" in script
    # deletes must precede inserts (changed quads: remove old o, add new o)
    assert script.index("DELETE DATA") < script.index("INSERT DATA")
    store = apply_update_script(script, quads_of_df(old))
    assert canonical_quadset(store) == canonical_quadset(quads_of_df(new))


def test_normalize_url_idempotent_on_fuzz_corpus(spark):
    """Canonical forms must be FIXED POINTS: normalize(normalize(u)) ==
    normalize(u) for a seeded corpus of messy URL shapes (otherwise two
    passes over a corpus disagree on the dedup key)."""
    import random

    rng = random.Random(97)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["A.com", "a.com", "WWW.Ex.ORG", "x.y.z.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a//b", "/a/b//", "//x"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=t", "?a=1&&b=2",
               "?ref=r&z=9", "?utm_x=1&utm_y=2"]
    frags = ["", "#f", "#a/b?c=1"]
    urls = ["".join([rng.choice(schemes), "://", rng.choice(hosts),
                     rng.choice(ports), rng.choice(paths),
                     rng.choice(queries), rng.choice(frags)])
            for _ in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    once = normalize_url(F.col("u"))
    bad = df.select(
        once.alias("n1"),
        normalize_url(once).alias("n2"),
    ).where(F.col("n1") != F.col("n2"))
    assert bad.count() == 0, bad.limit(5).collect()


def _normalize_url_py(u: str) -> str:
    """INDEPENDENT reference implementation (urllib-based, not regex) of
    the ops/web.py normalization rules — the differential oracle."""
    import re
    from urllib.parse import urlsplit

    sp = urlsplit(u)
    scheme = sp.scheme.lower()
    host = sp.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    path = re.sub(r"/{2,}", "/", sp.path) or "/"
    params = [p for p in sp.query.split("&")
              if p and not re.match(
                  r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)=", p)]
    q = "&".join(sorted(params))
    return f"{scheme}://{host}{path}" + (f"?{q}" if q else "")


def test_normalize_url_matches_urllib_oracle(spark):
    """Spark regex chain vs the independent urllib implementation on the
    seeded messy-URL corpus: byte-identical canonical forms."""
    import random

    rng = random.Random(41)
    schemes = ["http", "HTTP", "https", "HTTPS"]
    hosts = ["A.com", "a.com", "WWW.Ex.ORG", "x.y.z.net"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/a", "/a//b", "/a/b//", "/Ab/C"]
    queries = ["", "?a=1", "?b=2&a=1", "?utm_source=t", "?a=1&&b=2",
               "?ref=r&z=9", "?utm_x=1&utm_y=2&keep=1"]
    frags = ["", "#f", "#a/b?c=1"]
    urls = ["".join([rng.choice(schemes), "://", rng.choice(hosts),
                     rng.choice(ports), rng.choice(paths),
                     rng.choice(queries), rng.choice(frags)])
            for _ in range(500)]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = [r[0] for r in df.select(normalize_url(F.col("u"))).collect()]
    want = [_normalize_url_py(u) for u in urls]
    assert got == want
