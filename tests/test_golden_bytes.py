"""Golden-file byte tests (SURVEY.md §5.2.2).

The committed goldens pin the full per-document output — extracted
text, normalized items, extraction envelope — serialized with the
reference's exact JSON kwargs (ensure_ascii=False, indent=2;
/root/reference/src/ocr/extraction.py:201). Any byte drift in the core
is a parity regression.
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
