"""Unit tests for the Gopher rule filter (operators/text.py) and
link-density boilerplate classification (parse/wet.py)."""

from __future__ import annotations

import pandas as pd


GOOD = (
    "the quick brown fox jumps over the lazy dog and it will have been "
    "seen that all of these plain words keep a sensible average length "
    "with no strange symbols so the battery of rules should pass easily "
    "for this document because it reads like ordinary english prose text"
    " indeed and then some more"
)


def _rules(spark, texts: list[str]):
    from edgar_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    return gopher_rules(df).orderBy("doc_id").collect()


def test_gopher_rules_pass_and_fail_modes(spark):
    rows = _rules(
        spark,
        [
            GOOD,  # passes everything
            "too few words here",  # word-count fail
            GOOD + "\n" + "\n".join(["- b"] * 100),  # bullet-heavy
            GOOD + " " + "# " * 40,  # symbol-heavy
            ("zz " * 60).strip(),  # no alpha rule is fine, stopword fail
        ],
    )
    assert rows[0]["keep"] is True
    assert rows[1]["r_word_count"] is False and rows[1]["keep"] is False
    assert rows[2]["r_bullet"] is False and rows[2]["keep"] is False
    assert rows[3]["r_symbol_ratio"] is False and rows[3]["keep"] is False
    r4 = rows[4]
    assert r4["r_stop"] is False and r4["keep"] is False


def test_gopher_mean_word_length_bounds(spark):
    short = ("a b " * 30).strip()  # mean word length 1 -> fail low
    long_ = ("pneumonoultramicroscopic " * 60).strip()  # fail high
    rows = _rules(spark, [short, long_])
    assert rows[0]["r_mean_word_len"] is False
    assert rows[1]["r_mean_word_len"] is False


def test_block_density_classification(spark):
    from edgar_spark.parse.wet import block_density

    html = (
        '<nav><a href="/a">Home page link</a> <a href="/b">About page'
        " link</a></nav>"
        "<p>This is a long content paragraph with plenty of plain prose"
        " text and only one small <a href='/x'>link</a> inside it so the"
        " link density stays low.</p>"
        "<div>tiny</div>"
    )
    df = spark.createDataFrame(pd.DataFrame({"url": ["u"], "html": [html]}))
    rows = block_density(df).orderBy("block_idx").collect()
    # nav block: pure links -> boilerplate; paragraph: content; tiny: short
    kinds = [(r["n_chars"] >= 20, r["is_boilerplate"]) for r in rows]
    texts = [r["n_chars"] for r in rows]
    assert len(rows) == 3, texts
    nav, para, tiny = rows
    assert nav["is_boilerplate"] is True
    assert nav["n_link_chars"] > 0
    assert para["is_boilerplate"] is False
    assert tiny["is_boilerplate"] is True and tiny["n_chars"] < 20
    assert kinds  # silence lint


def test_markup_density_gates(spark):
    from edgar_spark.parse.wet import markup_density

    prose = (
        "<html><head><title>T</title></head><body><p>"
        + "plain readable prose text " * 20
        + "</p></body></html>"
    )
    shell = (
        '<html><head><script>var s = "' + "x" * 500 + '";</script>'
        "</head><body><div>app</div></body></html>"
    )
    soup = "<div>" + '<a href="/p">g</a>' * 50 + "</div>"
    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["prose", "shell", "soup", "empty"],
             "html": [prose, shell, soup, ""]}
        )
    )
    rows = {r["url"]: r for r in markup_density(df).collect()}
    assert rows["prose"]["is_contentful"] is True
    assert rows["prose"]["text_permille"] >= 250
    # script shell: body chars counted, visible text near zero
    assert rows["shell"]["is_contentful"] is False
    assert rows["shell"]["script_chars"] >= 500
    assert rows["shell"]["script_permille"] > 500
    # tag soup: 50 anchors + div = 102 markup events, ~9%% visible text
    assert rows["soup"]["is_contentful"] is False
    assert rows["soup"]["tag_count"] == 102
    assert rows["soup"]["text_permille"] < 250
    # empty page: guarded division, not contentful
    assert rows["empty"]["total_chars"] == 0
    assert rows["empty"]["text_permille"] == 0
    assert rows["empty"]["is_contentful"] is False
