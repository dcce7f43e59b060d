"""Arrow-batched parse operators (``mapInPandas`` over page batches).

One Python tokenizer pass per document, Arrow-batch transfer, no per-row
Python in the driver loop (input_hint requirement). Each wrapper consumes a
DataFrame of pages joined with their frontier context and emits exploded rows.

Design notes for scale:
- ``mapInPandas`` keeps the parse in executor-side Python workers; batch size
  is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- The expensive pre-filter trick (Sparser-style raw filtering, SURVEY.md §4):
  callers `.filter` pages on cheap substring predicates *before* these UDFs so
  Catalyst prunes non-parseable pages without invoking Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from edgar_spark.model.schemas import DOC_PRIORITY
from edgar_spark.parse.docs import (
    filing_index_parse,
    fin_report_facts,
    query_page_parse,
)

_QUERY_OUT = StructType(
    [
        StructField("ticker", StringType()),
        StructField("cik", StringType()),
        StructField("filing_type", StringType()),
        StructField("seed_seq", IntegerType()),
        StructField("type_seq", IntegerType()),
        StructField("filing_date", StringType()),
        StructField("viewer_url", StringType()),
    ]
)


def parse_query_pages(df: DataFrame) -> DataFrame:
    """queryPageParser (parser.go:34-53) over query-kind pages.

    Input columns: ticker, cik, filing_type, seed_seq, type_seq, text.
    Output: one row per (filing_date → viewer_url) entry.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                links = query_page_parse(t.text or "", t.filing_type)
                for date, href in links.items():
                    rows.append(
                        (t.ticker, t.cik, t.filing_type, t.seed_seq, t.type_seq, date, href)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _QUERY_OUT.fields])

    return df.select(
        "ticker", "cik", "filing_type", "seed_seq", "type_seq", "text"
    ).mapInPandas(gen, schema=_QUERY_OUT)


_INDEX_OUT = StructType(
    [
        StructField("ticker", StringType()),
        StructField("cik", StringType()),
        StructField("filing_type", StringType()),
        StructField("seed_seq", IntegerType()),
        StructField("type_seq", IntegerType()),
        StructField("filing_date", StringType()),
        StructField("accession", StringType()),
        StructField("doc_type", StringType()),
        StructField("doc_seq", IntegerType()),
        StructField("report_url", StringType()),
    ]
)


def parse_index_pages(df: DataFrame) -> DataFrame:
    """filingPageParser + mapReports (parser.go:86-127, reportmap.go:114-169)
    over filing-index (viewer) pages.

    Input columns: ticker, cik, filing_type, seed_seq, type_seq, filing_date,
    accession, text. Output: one row per classified doc type, doc_seq in the
    pinned canonical order (DOC_PRIORITY).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                try:
                    docs = filing_index_parse(t.text or "", t.filing_type)
                except (ValueError, IndexError, KeyError):
                    continue  # Go panics; we record a parse failure (no rows)
                for doc_type, url in docs.items():
                    rows.append(
                        (
                            t.ticker,
                            t.cik,
                            t.filing_type,
                            t.seed_seq,
                            t.type_seq,
                            t.filing_date,
                            t.accession,
                            doc_type,
                            DOC_PRIORITY.get(doc_type, 99),
                            url,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _INDEX_OUT.fields])

    return df.select(
        "ticker",
        "cik",
        "filing_type",
        "seed_seq",
        "type_seq",
        "filing_date",
        "accession",
        "text",
    ).mapInPandas(gen, schema=_INDEX_OUT)


_FACTS_OUT = StructType(
    [
        StructField("cik", StringType()),
        StructField("ticker", StringType()),
        StructField("filing_type", StringType()),
        StructField("filing_date", StringType()),
        StructField("accession", StringType()),
        StructField("doc_type", StringType()),
        StructField("doc_priority", IntegerType()),
        StructField("seq", IntegerType()),
        StructField("fin_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def parse_report_pages(df: DataFrame) -> DataFrame:
    """finReportParser (parser.go:326-347) over report pages → facts rows.

    Input columns: cik, ticker, filing_type, filing_date, accession, doc_type,
    text. Output: the FACTS_SCHEMA rows (all row-level candidates in document
    order; consolidation applies the zero-guard reduction).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                facts, _scales = fin_report_facts(t.text or "", t.doc_type)
                prio = DOC_PRIORITY.get(t.doc_type, 99)
                for seq, ft, val in facts:
                    rows.append(
                        (
                            t.cik,
                            t.ticker,
                            t.filing_type,
                            t.filing_date,
                            t.accession,
                            t.doc_type,
                            prio,
                            seq,
                            ft,
                            val,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in _FACTS_OUT.fields])

    return df.select(
        "cik", "ticker", "filing_type", "filing_date", "accession", "doc_type", "text"
    ).mapInPandas(gen, schema=_FACTS_OUT)
