"""Golden-file byte tests (SURVEY.md §5.2.2).

The committed goldens are REFERENCE-GENERATED (round 2): produced by
tools/gen_reference_goldens.py, which runs the reference's own pure
functions (/root/reference/src/ocr/postprocess.py normalize_ocr_lines +
extract_label_value_pairs; /root/reference/src/llm/field_extractor.py
extract_fields_with_llm with the deterministic alias mapper injected as
the LLM) on the engine's token streams and serializes with the
reference's exact JSON kwargs (ensure_ascii=False, indent=2;
/root/reference/src/ocr/extraction.py:201). A byte mismatch here is a
true parity break against the reference implementation, not just a
regression. Regenerate/verify: python tools/gen_reference_goldens.py --check
"""

from __future__ import annotations

from pathlib import Path

import pytest

from credit_ocr_backend_spark.core import default_config, process_document
from credit_ocr_backend_spark.core.document import dumps_envelope
from credit_ocr_backend_spark.sources.pages import build_page

GOLDEN_DIR = Path(__file__).parent / "goldens"
GOLDEN_KEYS = [0, 3, 10, 21]


@pytest.mark.parametrize("k", GOLDEN_KEYS)
def test_document_output_is_byte_identical(k: int) -> None:
    page = build_page(k)
    result = process_document(page["url"], page["html"], default_config())
    produced = dumps_envelope(
        {
            "url": result["url"],
            "status": result["status"],
            "extracted_text": result["extracted_text"],
            "items": result["items"],
            "extraction": result["extraction"],
        }
    )
    golden = (GOLDEN_DIR / f"doc_{k}.json").read_text(encoding="utf-8")
    assert produced == golden
