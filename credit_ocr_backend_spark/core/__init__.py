"""Pure-Python deterministic core — zero Spark imports.

Everything in this package operates on plain dicts/lists, exactly like
the reference's ``src/ocr/postprocess.py`` and
``src/llm/field_extractor.py``, so that:

* the ported reference pytest assertions run unchanged against it, and
* the Spark stages (which call these functions on Arrow batches) are
  guaranteed byte-identical to a single-process run per url.
"""

from credit_ocr_backend_spark.core.config import (
    DocumentTypeConfig,
    load_document_config,
    default_config,
)
from credit_ocr_backend_spark.core.postprocess import (
    pair_lines,
    normalize_items,
)
from credit_ocr_backend_spark.core.fields import (
    clean_value,
    validate_field,
    map_items_to_fields,
    extract_fields,
    normalize_label,
)
from credit_ocr_backend_spark.core.htmlparse import (
    parse_page,
    tokens_from_layout_words,
)
from credit_ocr_backend_spark.core.document import process_document

__all__ = [
    "DocumentTypeConfig",
    "load_document_config",
    "default_config",
    "pair_lines",
    "normalize_items",
    "clean_value",
    "validate_field",
    "map_items_to_fields",
    "extract_fields",
    "normalize_label",
    "parse_page",
    "tokens_from_layout_words",
    "process_document",
]
