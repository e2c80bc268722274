"""The four Arrow-batched pipeline stages (zero per-row Python on the
hot path — every stage is ``mapInPandas`` over Arrow record batches).

Stage semantics are the pure core's (credit_ocr_backend_spark.core);
these wrappers only do batching, schema projection, per-document
failure isolation and wall-clock metering. Mapping to the reference:

* parse     ≙ perform_ocr        (/root/reference/src/ocr/extraction.py:99-154)
* normalize ≙ postprocess_ocr    (:157-209)
* extract   ≙ run_llm_extraction (:212-305, LLM replaced by the
  deterministic alias mapper)
* fused     ≙ the direct library pipeline
  (/root/reference/tests/test_extraction.py:513-575) in one pass —
  the scale-preferred mode: it never materializes the ~10× token
  amplification between stages; resumability is kept at bucket
  granularity instead of stage granularity.

Config distribution: ``DocumentTypeConfig`` is a small plain dataclass
captured in the UDF closure — Spark ships it once per task via the
serialized closure (the broadcast-variable pattern of SURVEY.md §1.4;
an explicit ``sc.broadcast`` adds nothing for a <50 KB object).
"""

from __future__ import annotations

import math
import time
from typing import Any, Dict, Iterator, List, Optional

import pandas as pd

from credit_ocr_backend_spark.core.config import DocumentTypeConfig
from credit_ocr_backend_spark.core.document import (
    STATUS_FAILED,
    dumps_compact,
    process_document,
)
from credit_ocr_backend_spark.core.fields import extract_fields
from credit_ocr_backend_spark.core.htmlparse import parse_page
from credit_ocr_backend_spark.core.postprocess import normalize_items

# ---------------------------------------------------------------------------
# Schemas (DDL strings keep them greppable and driver-independent)
# ---------------------------------------------------------------------------

BBOX_T = "array<struct<x:double,y:double>>"
TOKENS_T = (
    f"array<struct<type:string,text:string,page:int,"
    f"bounding_box:{BBOX_T},confidence:double>>"
)
ITEMS_T = (
    f"array<struct<type:string,label:string,value:string,text:string,"
    f"page:int,confidence:double,bounding_box:{BBOX_T}>>"
)
FIELDS_T = (
    f"array<struct<field_name:string,value:string,confidence:double,"
    f"page:int,bounding_box:{BBOX_T},is_valid:boolean,errors:array<string>>>"
)

PARSED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, tokens {TOKENS_T}, proc_ms double"
)
NORMALIZED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, tokens {TOKENS_T}, items {ITEMS_T}, proc_ms double"
)
# fields travel as ONE compact-JSON string column: transferring nested
# list<struct> out of a pandas UDF costs ~5 ms/doc in per-element Python
# conversion (measured — as much as the whole extraction core), while a
# string column is a straight Arrow buffer; the relational view is
# recovered JVM-side with from_json(FIELDS_T) at full codegen speed.
EXTRACTED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, missing_fields array<string>, "
    f"fields_json string, proc_ms double"
)

# ---------------------------------------------------------------------------
# Arrow → plain-Python sanitization
# ---------------------------------------------------------------------------


def _plain(value: Any) -> Any:
    """Arrow round-trips hand back numpy scalars, NaN-for-null and
    ndarray-for-list; the core (and json.dumps) needs plain Python.
    Applied when *reading* nested columns back in staged mode so fused
    and staged runs are byte-identical."""
    if value is None:
        return None
    if isinstance(value, float):
        return None if math.isnan(value) else value
    if isinstance(value, (str, int, bool)):
        return value
    if isinstance(value, dict):
        return {k: _plain(v) for k, v in value.items()}
    if hasattr(value, "item") and not hasattr(value, "__len__"):  # numpy scalar
        return _plain(value.item())
    if hasattr(value, "__iter__"):
        return [_plain(v) for v in value]
    return value


def sanitize_tokens(tokens: Any) -> List[Dict[str, Any]]:
    out = []
    for tok in _plain(tokens) or []:
        page = tok.get("page")
        tok["page"] = int(page) if page is not None else None
        out.append(tok)
    return out


# ---------------------------------------------------------------------------
# Per-document assembly helpers (shared by fused and staged paths)
# ---------------------------------------------------------------------------


def _field_rows(extraction: Optional[Dict[str, Any]]) -> List[Dict[str, Any]]:
    """Flatten the extraction envelope to long-format field structs
    (mirrors ExtrahierteDaten, /root/reference/schema.sql:35-43)."""
    if not extraction:
        return []
    rows = []
    validations = extraction.get("validation_results", {})
    for name, data in extraction.get("extracted_fields", {}).items():
        validation = validations.get(name)
        value = data.get("value")
        rows.append(
            {
                "field_name": name,
                "value": value if isinstance(value, str) or value is None else str(value),
                "confidence": data.get("confidence"),
                "page": data.get("page"),
                "bounding_box": data.get("bounding_box"),
                "is_valid": validation["is_valid"] if validation else None,
                "errors": validation["errors"] if validation else None,
            }
        )
    return rows


def _extracted_row(
    url: str, bucket: int, status: str, error: Optional[str],
    extracted_text: str, extraction: Optional[Dict[str, Any]], proc_ms: float,
) -> Dict[str, Any]:
    return {
        "url": url,
        "bucket": bucket,
        "status": status,
        "error": error,
        "extracted_text": extracted_text,
        "missing_fields": (extraction or {}).get("missing_fields"),
        "fields_json": dumps_compact(_field_rows(extraction)),
        "proc_ms": proc_ms,
    }


# ---------------------------------------------------------------------------
# Stage factories — each returns a mapInPandas-compatible generator fn
# ---------------------------------------------------------------------------


def make_fused_stage(doc_config: DocumentTypeConfig):
    """html → extraction results in one Arrow-batched pass."""

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, bucket, html in zip(pdf["url"], pdf["bucket"], pdf["html"]):
                t0 = time.perf_counter()
                r = process_document(url, bytes(html), doc_config)
                ms = (time.perf_counter() - t0) * 1000.0
                rows.append(
                    _extracted_row(
                        url, int(bucket), r["status"], r["error"],
                        r["extracted_text"], r["extraction"], ms,
                    )
                )
            yield pd.DataFrame(rows)

    return fused


def make_parse_stage():
    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, bucket, html in zip(pdf["url"], pdf["bucket"], pdf["html"]):
                t0 = time.perf_counter()
                status, error, tokens, text = "parsed", None, [], ""
                try:
                    tokens, text = parse_page(bytes(html))
                except Exception as exc:
                    status, error = STATUS_FAILED, f"{type(exc).__name__}: {exc}"
                rows.append(
                    {
                        "url": url, "bucket": int(bucket), "status": status,
                        "error": error, "extracted_text": text, "tokens": tokens,
                        "proc_ms": (time.perf_counter() - t0) * 1000.0,
                    }
                )
            yield pd.DataFrame(rows)

    return parse


def make_normalize_stage():
    def normalize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                t0 = time.perf_counter()
                tokens = sanitize_tokens(rec["tokens"])
                status, error, items = "normalized", rec["error"], []
                if rec["status"] == STATUS_FAILED:
                    status = STATUS_FAILED
                else:
                    try:
                        items = normalize_items(tokens)
                    except Exception as exc:
                        status, error = STATUS_FAILED, f"{type(exc).__name__}: {exc}"
                rows.append(
                    {
                        "url": rec["url"], "bucket": int(rec["bucket"]),
                        "status": status, "error": error,
                        "extracted_text": rec["extracted_text"],
                        "tokens": tokens, "items": items,
                        "proc_ms": (time.perf_counter() - t0) * 1000.0,
                    }
                )
            yield pd.DataFrame(rows)

    return normalize


def make_extract_stage(doc_config: DocumentTypeConfig):
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                t0 = time.perf_counter()
                status, error, extraction = "done", rec["error"], None
                if rec["status"] == STATUS_FAILED:
                    status = STATUS_FAILED
                else:
                    try:
                        tokens = sanitize_tokens(rec["tokens"])
                        items = _plain(rec["items"]) or []
                        for item in items:
                            if item.get("page") is not None:
                                item["page"] = int(item["page"])
                        extraction = extract_fields(
                            items, doc_config, original_ocr_lines=tokens
                        )
                    except Exception as exc:
                        status, error = STATUS_FAILED, f"{type(exc).__name__}: {exc}"
                rows.append(
                    _extracted_row(
                        rec["url"], int(rec["bucket"]), status, error,
                        rec["extracted_text"], extraction,
                        (time.perf_counter() - t0) * 1000.0,
                    )
                )
            yield pd.DataFrame(rows)

    return extract
