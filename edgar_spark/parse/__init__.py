"""Pure-Python parse kernels (no Spark imports).

These replicate the reference engine's single-pass HTML tokenizer walks
(/root/reference/parser.go, reportmap.go, utils.go, xbrltags.go) so that the
extracted strings/values are byte-identical per url. They are wrapped into
Arrow-vectorized pandas UDFs in ``edgar_spark.operators.udfs``.
"""

from edgar_spark.parse.tokenizer import Tok, TokenCursor, escape_string, tokenize
from edgar_spark.parse.numbers import (
    filing_scale,
    is_same_scale,
    normalize_number,
    trunc_round,
)
from edgar_spark.parse.xbrl import fin_data_type_from_tag, xbrl_tag_from_onclick
from edgar_spark.parse.tables import (
    parse_table_heading,
    parse_table_row,
)
from edgar_spark.parse.docs import (
    cik_page_parse,
    filing_index_parse,
    fin_report_facts,
    map_reports,
    query_page_parse,
)

__all__ = [
    "Tok",
    "TokenCursor",
    "escape_string",
    "tokenize",
    "normalize_number",
    "trunc_round",
    "is_same_scale",
    "filing_scale",
    "xbrl_tag_from_onclick",
    "fin_data_type_from_tag",
    "parse_table_row",
    "parse_table_heading",
    "query_page_parse",
    "cik_page_parse",
    "filing_index_parse",
    "map_reports",
    "fin_report_facts",
]
