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

import json
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

# Nested payloads (tokens / items / fields) travel as compact-JSON
# STRING columns between stages, not as list<struct>:
#  * transferring nested list<struct> through a pandas UDF costs ~5 ms/doc
#    in per-element Python conversion (measured — as much as the whole
#    extraction core); a string column is a straight Arrow buffer;
#  * json round-trips the core's plain dicts EXACTLY (missing keys stay
#    missing, None stays None — no NaN/numpy-scalar sanitization layer),
#    which is what makes staged mode byte-identical to fused by
#    construction;
#  * a relational view is recovered JVM-side at codegen speed with
#    from_json(TOKENS_T / ITEMS_T / FIELDS_T) when a query needs it.
PARSED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, tokens_json string, proc_ms double"
)
NORMALIZED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, tokens_json string, items_json string, proc_ms double"
)
EXTRACTED_SCHEMA = (
    f"url string, bucket int, status string, error string, "
    f"extracted_text string, missing_fields array<string>, "
    f"fields_json string, proc_ms double"
)


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
                if html is None:
                    # NULL html reaches the stage (routed to bulk by
                    # _defuse_skew) and is RECORDED as failed — never
                    # silently dropped from the per-bucket accounting.
                    rows.append(
                        _extracted_row(
                            url, int(bucket), STATUS_FAILED,
                            "ValueError: null html payload", "", None,
                            (time.perf_counter() - t0) * 1000.0,
                        )
                    )
                    continue
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
                    if html is None:
                        raise ValueError("null html payload")
                    tokens, text = parse_page(bytes(html))
                except Exception as exc:
                    status, error = STATUS_FAILED, f"{type(exc).__name__}: {exc}"
                rows.append(
                    {
                        "url": url, "bucket": int(bucket), "status": status,
                        "error": error, "extracted_text": text,
                        "tokens_json": dumps_compact(tokens),
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
                status, error, items = "normalized", rec["error"], []
                if rec["status"] == STATUS_FAILED:
                    status = STATUS_FAILED
                else:
                    try:
                        items = normalize_items(json.loads(rec["tokens_json"]))
                    except Exception as exc:
                        status, error = STATUS_FAILED, f"{type(exc).__name__}: {exc}"
                rows.append(
                    {
                        "url": rec["url"], "bucket": int(rec["bucket"]),
                        "status": status, "error": error,
                        "extracted_text": rec["extracted_text"],
                        "tokens_json": rec["tokens_json"],
                        "items_json": dumps_compact(items),
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
                        extraction = extract_fields(
                            json.loads(rec["items_json"]),
                            doc_config,
                            original_ocr_lines=json.loads(rec["tokens_json"]),
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
