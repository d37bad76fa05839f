"""Invoice-style Pydantic template — the acceptance case for
sparkdoc.template.compile_template (the reference's template-authoring
conventions: model_config graph_id_fields / is_entity / graph_max_instances,
json_schema_extra edge_label / graph_reference / reference_closed_catalog —
graph_converter.py:37-58, dense/catalog.py:34-75; golden template SHAPE per
tests/fixtures/templategen/golden/invoice.py, code written fresh here).

Carries the engine-native deterministic rules inline (x_discover / x_rule)
so the compiled template runs the full convert_document_graph pipeline over
sparkdoc.synth.invoice_nodes_df with no rules overlay.
"""

from __future__ import annotations

import re
from enum import Enum
from typing import Any, List, Optional

from pydantic import BaseModel, ConfigDict, Field, field_validator


class DocKind(str, Enum):
    INVOICE = "INVOICE"
    CREDIT_NOTE = "CREDIT NOTE"
    OTHER = "OTHER"


class TaxBracket(BaseModel):
    """Document-level tax bracket; value object, never a standalone node."""

    model_config = ConfigDict(is_entity=False)

    tax_kind: Optional[str] = Field(
        None,
        description="Tax scheme as printed (VAT, GST).",
        json_schema_extra={"x_rule": {"kind": "context", "pattern": r"\b(VAT|GST) \d"}},
    )
    tax_amount: Optional[float] = Field(
        None,
        description="Bracket amount, numeric.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"\b(?:VAT|GST) (\d+\.\d{2})"}
        },
    )

    @field_validator("tax_amount", mode="before")
    @classmethod
    def _numeric(cls, v: Any) -> Any:
        if isinstance(v, str):
            stripped = re.sub(r"[^0-9.\-]", "", v)
            try:
                return float(stripped)
            except ValueError:
                return None
        return v


class Party(BaseModel):
    """An organization involved in the document (seller or buyer)."""

    model_config = ConfigDict(graph_id_fields=["name"], graph_max_instances=6)

    name: str = Field(..., description="Legal name as printed.")
    vat_number: Optional[str] = Field(
        None,
        description="VAT identifier printed next to the name.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"{id} \(VAT ([A-Z0-9]+)\)"}
        },
    )


class CatalogItem(BaseModel):
    """A billable product from the document's item catalog."""

    model_config = ConfigDict(
        graph_id_fields=["name"],
        x_discover=r"\* ([A-Z][A-Za-z0-9 -]+?) \[",
    )

    name: str = Field(..., description="Item name from the catalog listing.")
    category: Optional[str] = Field(
        None,
        description="Catalog category tag.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"\* {id} \[([A-Za-z]+)\]"}
        },
    )


class BillingRow(BaseModel):
    """One billing-table row, identified by its printed row number."""

    model_config = ConfigDict(
        graph_id_fields=["row_no"],
        x_discover=r"Row (\d+):",
        # row numbers repeat across invoices — identity is document-local
        x_doc_scoped=True,
    )

    row_no: str = Field(..., description="Printed row number.")
    quantity: Optional[int] = Field(
        None,
        description="Quantity billed on the row.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"Row {id}: (\d+) x"}
        },
    )
    item: Optional[CatalogItem] = Field(
        None,
        description="The catalog item billed on this row (id-only reference).",
        json_schema_extra={
            "edge_label": "REFERENCES_ITEM",
            "graph_reference": True,
            "reference_closed_catalog": True,
            "x_rule": {
                "kind": "context",
                "pattern": r"Row {id}: \d+ x ([A-Z][A-Za-z0-9 -]+?)\.",
            },
        },
    )


class InvoiceDoc(BaseModel):
    """A synthetic invoice or credit note; one root per document."""

    model_config = ConfigDict(graph_id_fields=["invoice_number"])

    invoice_number: str = Field(..., description="Document number from the header.")
    doc_kind: DocKind = Field(
        DocKind.OTHER,
        description="Document kind printed as the title.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"\b(INVOICE|CREDIT NOTE)\b"}
        },
    )
    currency: Optional[str] = Field(
        None,
        description="ISO 4217 currency code.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"Currency: ([A-Z]{3})"}
        },
    )
    issued: Optional[str] = Field(
        None,
        description="Issue date, YYYY-MM-DD.",
        json_schema_extra={
            "x_rule": {"kind": "context", "pattern": r"Issued (\d{4}-\d{2}-\d{2})"}
        },
    )
    seller: Optional[Party] = Field(
        None,
        description="Issuing party.",
        json_schema_extra={"edge_label": "ISSUED_BY"},
    )
    buyer: Optional[Party] = Field(
        None,
        description="Billed party.",
        json_schema_extra={"edge_label": "BILLED_TO"},
    )
    catalog: List[CatalogItem] = Field(
        default_factory=list,
        description="Catalog of distinct items billed (canonical home).",
        json_schema_extra={"edge_label": "CONTAINS_ITEM"},
    )
    rows: List[BillingRow] = Field(
        default_factory=list,
        description="Billing-table rows in printed order.",
        json_schema_extra={"edge_label": "CONTAINS_LINE"},
    )
    taxes: List[TaxBracket] = Field(
        default_factory=list,
        description="Document-level tax brackets.",
        json_schema_extra={"edge_label": "HAS_TAX"},
    )

    @field_validator("currency", mode="before")
    @classmethod
    def _iso_currency(cls, v: Any) -> Any:
        if not v:
            return v
        symbol = {"€": "EUR", "$": "USD", "£": "GBP"}
        s = str(v).strip()
        return symbol.get(s, s.upper())


#: path-keyed rules the template cannot embed per-occurrence: seller and
#: buyer are the same Party class at two catalog paths, discovered by
#: different anchors
INVOICE_RULES = {
    "seller": {"discover": r"Seller: ([A-Z][A-Za-z ]+?) \(VAT"},
    "buyer": {"discover": r"Bill To: ([A-Z][A-Za-z ]+?)\."},
}
