"""Source connectors, extraction rules, scalar enrichers
(stream_connectors.rs / stream_transform.rs declared surface)."""

import pytest
from pyspark.sql import functions as F


def test_json_extraction_rule(spark):
    from dd_graphdb_spark.sources import ExtractionRule, apply_extraction

    df = spark.createDataFrame(
        [(1, '{"name": "a", "score": 7}'), (2, '{"name": "b", "score": 3}')],
        "id long, payload string",
    )
    rule = ExtractionRule(
        rule_id="r1",
        format="json",
        field_mappings={"name": "$.name", "score": "$.score"},
        types={"score": "long"},
        filters=["score > 5"],
    )
    rows = apply_extraction(df, "payload", rule).select("id", "name", "score").collect()
    assert [tuple(r) for r in rows] == [(1, "a", 7)]


def test_regex_and_csv_rules(spark):
    from dd_graphdb_spark.sources import ExtractionRule, apply_extraction

    df = spark.createDataFrame([("user=alice id=9",), ("user=bob id=4",)], "line string")
    re_rule = ExtractionRule(
        rule_id="r2", format="regex", field_mappings={"user": r"user=(\w+)"}
    )
    assert {r["user"] for r in apply_extraction(df, "line", re_rule).collect()} == {
        "alice",
        "bob",
    }

    csv = spark.createDataFrame([("7,x",), ("8,y",)], "line string")
    csv_rule = ExtractionRule(
        rule_id="r3",
        format="csv",
        field_mappings={"n": "n", "s": "s"},
        csv_schema="n LONG, s STRING",
    )
    out = apply_extraction(csv, "line", csv_rule)
    assert {(r["n"], r["s"]) for r in out.collect()} == {(7, "x"), (8, "y")}


def test_rate_stream_live(spark):
    """Rate source runs end-to-end through an extraction-free window agg."""
    from dd_graphdb_spark.sources import rate_stream
    from dd_graphdb_spark.streaming import run_to_memory

    stream = rate_stream(spark, rows_per_second=50).groupBy().agg(
        F.count("*").alias("n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_probe")
        .outputMode("complete")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            rows = spark.table("rate_probe").collect()
            n = rows[0]["n"] if rows else 0
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
    finally:
        q.stop()


def test_typed_accessors_and_render(spark):
    from dd_graphdb_spark.functions import as_float64, as_int64, as_string, render_props

    df = spark.createDataFrame(
        [(1, {"age": "30", "name": '"Ann"'})], "id long, properties map<string,string>"
    )
    row = df.select(
        as_int64("properties", "age").alias("i"),
        as_float64("properties", "age").alias("f"),  # int→float widening
        as_string("properties", "name").alias("s"),
        render_props("properties").alias("j"),
    ).collect()[0]
    assert row["i"] == 30 and row["f"] == 30.0 and row["s"] == "Ann"
    assert '"age":"30"' in row["j"]


def test_latency_and_geo_enrichers(spark):
    from dd_graphdb_spark.functions import geo_enrich, with_processing_time

    df = spark.createDataFrame(
        [(i, "2026-01-01 00:00:00") for i in range(10)], "user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    lat = with_processing_time(df)
    assert {"processing_ts", "latency_ms"} <= set(lat.columns)
    assert lat.filter(F.col("latency_ms") <= 0).count() == 0

    geo = geo_enrich(df, "user_id")
    assert geo.count() == 10
    by_bucket = {r["user_id"]: r["region_code"] for r in geo.collect()}
    assert by_bucket[0] == "NA" and by_bucket[6] == "EU"
    # broadcast hint must survive into the plan (no shuffle of the fact side)
    assert "Broadcast" in geo._jdf.queryExecution().executedPlan().toString()


def test_geo_enrich_keeps_negative_and_null_keys(spark):
    """An enricher must never drop fact rows: negative keys bucket via
    pmod, NULL keys keep their row with null region columns."""
    from dd_graphdb_spark.functions.scalar import geo_enrich

    df = spark.createDataFrame([(3,), (-3,), (None,)], "user_id long")
    out = geo_enrich(df)
    assert out.count() == 3
    rows = {r["user_id"]: (r["bucket"], r["region"]) for r in out.collect()}
    assert rows[3][0] == 3 and rows[3][1] is not None
    assert rows[-3][0] == 2 and rows[-3][1] is not None  # pmod(-3,5)=2
    assert rows[None][0] is None and rows[None][1] is None


def test_events_oracle_rewrite_preserves_as_alias():
    from dd_graphdb_spark.graph import EVENTS_US, rewrite_events_oracles

    o = {
        "q1": "SELECT e.ts FROM events AS e WHERE e.v > 1",
        "q2": "SELECT x FROM events JOIN b ON events.ts = b.ts",
        "q3": "SELECT ts FROM events",
    }
    rewrite_events_oracles(o)
    assert o["q1"] == f"SELECT e.ts FROM {EVENTS_US} e WHERE e.v > 1"
    assert o["q2"].startswith(f"SELECT x FROM {EVENTS_US} events JOIN b")
    assert o["q3"] == f"SELECT ts FROM {EVENTS_US} events"


def test_events_oracle_rewrite_mixed_inline_and_raw():
    """An oracle mixing a hand-interpolated EVENTS_US subquery with a
    second RAW `FROM events` must get the raw one truncated too — and
    the pre-substituted span must not be double-wrapped (ADVICE r6)."""
    from dd_graphdb_spark.graph import EVENTS_US, rewrite_events_oracles

    o = {"mix": f"WITH a AS (SELECT ts FROM {EVENTS_US} e) SELECT * FROM events"}
    rewrite_events_oracles(o)
    assert o["mix"] == (
        f"WITH a AS (SELECT ts FROM {EVENTS_US} e) SELECT * FROM {EVENTS_US} events"
    )
    # idempotent: a second pass changes nothing
    before = dict(o)
    rewrite_events_oracles(o)
    assert o == before


def test_tokens_whitespace_runs_and_stopword_case(spark):
    """\\s+ tokenization (double spaces, tabs, newlines) and
    case-insensitive stopwords."""
    from dd_graphdb_spark.operators.text import lang_id, quality_score, token_count

    df = spark.createDataFrame(
        [(1, "a  b"), (2, "a\tb\nc"), (3, ""), (4, "The Cat In The Hat Is A Cat")],
        "doc_id long, text string",
    )
    counts = {r["doc_id"]: r["n_tokens"] for r in token_count(df).collect()}
    assert counts == {1: 2, 2: 3, 3: 0, 4: 8}
    q = {r["doc_id"]: r["stopword_ratio"] for r in quality_score(df).collect()}
    assert q[4] == 0.625  # The/In/The/Is/A (5 of 8) match case-insensitively
    langs = {r["doc_id"]: r["lang_pred"] for r in lang_id(df).collect()}
    assert langs[4] == "en"


def test_redact_pii_real_phone_shapes(spark):
    from dd_graphdb_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "call 555-123-4567 now"),
            (2, "intl +1-800-555-0123"),
            (3, "dotted 555.123.4567"),
            (4, "ssn 123-45-6789 stays ssn"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (r["redacted"], r["n_phone"], r["n_ssn"]) for r in redact_pii(df).collect()}
    assert rows[1] == ("call <PHONE> now", 1, 0)
    assert rows[2] == ("intl <PHONE>", 1, 0)
    assert rows[3] == ("dotted <PHONE>", 1, 0)
    assert rows[4] == ("ssn <SSN> stays ssn", 0, 1)


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus with hand-derivable probabilities: corpus 'a b',
    'a b', 'a c', 'solo' → V=4 (every token counts, including 1-token
    docs); c(a,b)=2, c(a,c)=1, c(a·)=3. k=0.5:
    P(b|a)=(2+.5)/(3+2)=0.5; P(c|a)=(1+.5)/5=0.3."""
    import math

    from dd_graphdb_spark.operators.text import bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo"), (5, "")],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in bigram_lm_scores(df).collect()}
    assert out[1]["n_bigrams"] == 1
    assert out[1]["lm_score"] == pytest.approx(round(math.log(0.5), 6), abs=2e-6)
    assert out[3]["lm_score"] == pytest.approx(round(math.log(0.3), 6), abs=2e-6)
    # boilerplate ('a b' seen twice) scores higher than the rarer 'a c'
    assert out[1]["lm_score"] > out[3]["lm_score"]
    # <2 tokens → no bigrams, NULL score
    assert out[4]["n_bigrams"] == 0 and out[4]["lm_score"] is None
    assert out[5]["n_bigrams"] == 0 and out[5]["lm_score"] is None
