"""Field registry: the reference's struct model flattened to one table.

One entry per float field of the reference's report sub-structs
(/root/reference/report.go:16-56), in struct order. This single registry
drives the parse kernel (entity-scale lookup), the facts→filings
consolidation, the CollectedData() array (filing.go:279-302 order: Entity,
Bs, Cf, Ops — Go field names), the bitmask re-computation for JSON export,
and the wide ``filings`` schema.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

from edgar_spark.parse import xbrl
from edgar_spark.parse.numbers import ENTITY_MONEY, ENTITY_PER_SHARE, ENTITY_SHARES


@dataclass(frozen=True)
class Field:
    col: str  # snake_case column in the filings table
    go_name: str  # reference struct field name (CollectedData() vocabulary)
    fin_type: str  # finDataType string == the struct's json tag
    struct: str  # entity | ops | cf | bs
    bit: int  # presence-bit position (report.go bit tags)
    entity: str  # scale entity class
    required: bool
    generate: bool


# report.go:16-19 (entityData), :21-31 (opsData), :33-39 (cfData), :41-56 (bsData)
FIELDS: List[Field] = [
    Field("sharecount", "ShareCount", xbrl.FT_SHARECOUNT, "entity", 0, ENTITY_SHARES, True, False),
    Field("revenue", "Revenue", xbrl.FT_REVENUE, "ops", 0, ENTITY_MONEY, True, False),
    Field("cost_of_revenue", "CostOfSales", xbrl.FT_COST_OF_REVENUE, "ops", 1, ENTITY_MONEY, True, False),
    Field("gross_margin", "GrossMargin", xbrl.FT_GROSS_MARGIN, "ops", 2, ENTITY_MONEY, True, True),
    Field("op_income", "OpIncome", xbrl.FT_OP_INCOME, "ops", 3, ENTITY_MONEY, True, False),
    Field("op_expense", "OpExpense", xbrl.FT_OP_EXPENSE, "ops", 4, ENTITY_MONEY, True, True),
    Field("net_income", "NetIncome", xbrl.FT_NET_INCOME, "ops", 5, ENTITY_MONEY, True, False),
    Field("washares", "WAShares", xbrl.FT_WASHARES, "ops", 6, ENTITY_SHARES, True, False),
    Field("dps", "Dps", xbrl.FT_DPS, "ops", 7, ENTITY_PER_SHARE, True, True),
    Field("op_cashflow", "OpCashFlow", xbrl.FT_OP_CASH_FLOW, "cf", 0, ENTITY_MONEY, True, False),
    Field("capex", "CapEx", xbrl.FT_CAPEX, "cf", 1, ENTITY_MONEY, True, False),
    Field("dividends", "Dividends", xbrl.FT_DIVIDEND, "cf", 2, ENTITY_MONEY, False, False),
    Field("interest", "Interest", xbrl.FT_INTEREST, "cf", 3, ENTITY_MONEY, False, False),
    Field("ldebt", "LDebt", xbrl.FT_LDEBT, "bs", 0, ENTITY_MONEY, False, False),
    Field("sdebt", "SDebt", xbrl.FT_SDEBT, "bs", 1, ENTITY_MONEY, False, False),
    Field("cliab", "CLiab", xbrl.FT_CLIAB, "bs", 2, ENTITY_MONEY, True, False),
    Field("deferred", "Deferred", xbrl.FT_DEFERRED, "bs", 3, ENTITY_MONEY, False, False),
    Field("retained", "Retained", xbrl.FT_RETAINED, "bs", 4, ENTITY_MONEY, True, False),
    Field("equity", "Equity", xbrl.FT_EQUITY, "bs", 5, ENTITY_MONEY, True, False),
    Field("cassets", "CAssets", xbrl.FT_CASSETS, "bs", 6, ENTITY_MONEY, True, False),
    Field("cash", "Cash", xbrl.FT_CASH, "bs", 7, ENTITY_MONEY, True, False),
    Field("securities", "Securities", xbrl.FT_SECURITIES, "bs", 8, ENTITY_MONEY, False, False),
    Field("goodwill", "Goodwill", xbrl.FT_GOODWILL, "bs", 9, ENTITY_MONEY, False, False),
    Field("intangibles", "Intangibles", xbrl.FT_INTANGIBLE, "bs", 10, ENTITY_MONEY, False, False),
    Field("assets", "Assets", xbrl.FT_ASSETS, "bs", 11, ENTITY_MONEY, True, False),
    Field("liab", "Liab", xbrl.FT_LIAB, "bs", 12, ENTITY_MONEY, True, False),
]

BY_FIN_TYPE: Dict[str, Field] = {f.fin_type: f for f in FIELDS}
BY_COL: Dict[str, Field] = {f.col: f for f in FIELDS}
BY_GO_NAME: Dict[str, Field] = {f.go_name: f for f in FIELDS}

# filing.go:296-299 — CollectedData() evaluates Entity, Bs, Cf, Ops in that
# order, each in struct-field order.
COLLECTED_ORDER: List[Field] = (
    [f for f in FIELDS if f.struct == "entity"]
    + [f for f in FIELDS if f.struct == "bs"]
    + [f for f in FIELDS if f.struct == "cf"]
    + [f for f in FIELDS if f.struct == "ops"]
)

# Strict data→doc gate (data_def.go:90-92): Cash only from the BS document.
STRICT_DOC_FOR_FIN_TYPE: Dict[str, str] = {xbrl.FT_CASH: "Assets"}


def entity_of(fin_type: str) -> Optional[str]:
    f = BY_FIN_TYPE.get(fin_type)
    return f.entity if f else None
