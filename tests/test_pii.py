"""PII detection/redaction rule vectors (ops/text.redact_pii): ordered
regexp chain, attribution to exactly one kind, false-positive guards."""

from pyspark.sql import functions as F

from rdf_mapper_spark.ops.text import scrub_documents


def _scrub_one(spark, text):
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    return scrub_documents(df).collect()[0]


def test_each_kind_redacts_and_counts(spark):
    r = _scrub_one(
        spark,
        "mail a.b+c@ex-ample.co.uk or bob@x.io, call +1 (415) 555-0042 "
        "or 0170-555-99, host 192.168.0.1, ssn 123-45-6789 done",
    )
    assert r.n_email == 2 and "<EMAIL>" in r.clean_text
    assert r.n_ssn == 1 and "<SSN>" in r.clean_text
    assert r.n_ipv4 == 1 and "<IPV4>" in r.clean_text
    assert r.n_phone == 2 and "<PHONE>" in r.clean_text
    for pii in ("@", "555-0042", "192.168.0.1", "123-45-6789"):
        assert pii not in r.clean_text


def test_attribution_is_exclusive(spark):
    """An email's digit runs must not also count as a phone; a dotted quad
    must count as ipv4, not phone (order: email, ssn, ipv4, phone)."""
    r = _scrub_one(spark, "reach 415-555-0042@example.com at 10.0.42.1")
    assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (1, 0, 1, 0)


def test_false_positive_guards(spark):
    """Prices, years, plain numbers and version strings survive."""
    r = _scrub_one(
        spark, "in 2021 we sold 1234567 units at 19.99 with v1.2.3 builds")
    assert (r.n_email, r.n_ssn, r.n_ipv4, r.n_phone) == (0, 0, 0, 0)
    assert r.clean_text.startswith("in 2021 we sold 1234567 units")


def test_scrub_is_map_only_jvm(spark):
    df = spark.createDataFrame([(i, f"user{i}@x.io") for i in range(10)],
                               ["doc_id", "text"])
    plan = scrub_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
