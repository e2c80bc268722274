"""Document-type configuration (schema-on-read contract).

Mirrors the reference's config surface: ``DocumentTypeConfig``
(/root/reference/src/config.py:141-146) loaded from the JSON file
``config/document_types.conf``
(/root/reference/src/llm/field_extractor.py:14-29). The config instance
is a plain picklable dataclass so the Spark layer can broadcast it into
Arrow-batched UDFs.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List

# Repo-local copy of the reference's config/document_types.conf
# (22 expected_fields, 37 field_mappings aliases, typed validation_rules).
_DEFAULT_CONF_PATH = Path(__file__).resolve().parents[2] / "config" / "document_types.conf"


@dataclass
class DocumentTypeConfig:
    name: str
    expected_fields: List[str]
    field_descriptions: Dict[str, str]
    validation_rules: Dict[str, Any]
    field_mappings: Dict[str, str] = field(default_factory=dict)


def _read_text(path: str | Path) -> str:
    """Read a repo file that may live inside a ``--py-files`` zip.

    Under ``spark-submit --py-files engine.zip`` the package's
    ``__file__`` paths look like ``.../engine.zip/credit_ocr.../x.py``;
    plain ``open()`` on a sibling resolved from them fails with
    NotADirectoryError. Detect the ``*.zip/`` segment and read the
    member through zipfile instead — executors and the driver both hit
    this on a real cluster, so it must work without a checkout."""
    p = str(path)
    try:
        with open(p, "r", encoding="utf-8") as f:
            return f.read()
    except (NotADirectoryError, FileNotFoundError):
        import re
        import zipfile

        m = re.match(r"^(.*?\.zip)/(.+)$", p)
        if not m:
            raise
        with zipfile.ZipFile(m.group(1)) as z:
            return z.read(m.group(2)).decode("utf-8")


def load_document_config(config_path: str | Path) -> Dict[str, DocumentTypeConfig]:
    """Load document configuration from a JSON file.

    Same contract as the reference loader
    (/root/reference/src/llm/field_extractor.py:14-29): one
    ``DocumentTypeConfig`` per top-level document type.
    """
    config_data = json.loads(_read_text(config_path))

    document_types: Dict[str, DocumentTypeConfig] = {}
    for doc_type, doc_config in config_data.items():
        document_types[doc_type] = DocumentTypeConfig(
            name=doc_config["name"],
            expected_fields=doc_config["expected_fields"],
            field_descriptions=doc_config["field_descriptions"],
            validation_rules=doc_config["validation_rules"],
            field_mappings=doc_config.get("field_mappings", {}),
        )
    return document_types


def default_config(document_type: str = "credit_request") -> DocumentTypeConfig:
    """The repo-bundled credit_request config (the reference's only type)."""
    return load_document_config(_DEFAULT_CONF_PATH)[document_type]
