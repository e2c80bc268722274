"""Regenerate tests/goldens/doc_*.json from the REFERENCE's own pure
functions (SURVEY.md §5.2.2, round-2 judge item 4).

The round-1 goldens pinned the engine's own output — regression
evidence, not parity evidence.  This script produces the goldens by
running the reference implementation itself:

* items:      /root/reference/src/ocr/postprocess.py
              ``normalize_ocr_lines`` (which calls
              ``extract_label_value_pairs``) on the engine's token
              stream;
* extraction: /root/reference/src/llm/field_extractor.py
              ``extract_fields_with_llm`` (:307-441) run end-to-end
              with a deterministic fake LLM client whose ``generate``
              returns the engine's alias-mapper result as JSON — the
              documented LLM stand-in (core/fields.py
              ``map_items_to_fields``), so every downstream step
              (evidence precedence, alias rename, validation) is the
              reference's own code.

Only the HTML tokenizer (core/htmlparse.py) is engine-side: the
reference consumes Azure-OCR output and has no HTML analogue; the
token stream *is* the shared input, exactly as the north rule's
"byte-identical extracted text per url" invariant is defined over it.

Import shims: the reference modules pull in azure-formrecognizer /
pyhocon / aiohttp, none of which are installed (and none of which are
exercised by the pure functions above), so empty stand-in modules are
injected before import.  /root/reference is only ever *read*.

Usage:  python tools/gen_reference_goldens.py [--check]
  --check: do not write; exit 1 if the engine's process_document output
           differs from the reference-produced bytes.
"""

from __future__ import annotations

import asyncio
import json
import sys
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")
sys.path.insert(0, str(REPO))

# --- import shims for the reference's heavyweight deps -----------------
def _stub_module(name: str, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


_stub_module("azure")
_stub_module("azure.ai")
_stub_module("azure.ai.formrecognizer", AnalyzeResult=object)
_stub_module("pyhocon", ConfigFactory=object, ConfigTree=object)
_stub_module("aiohttp")

sys.path.insert(0, str(REFERENCE))
_stub_module("src.llm.client", OllamaClient=object)

from src.ocr import postprocess as ref_post  # noqa: E402
from src.llm import field_extractor as ref_fx  # noqa: E402

from credit_ocr_backend_spark.core import default_config  # noqa: E402
from credit_ocr_backend_spark.core.document import (  # noqa: E402
    dumps_envelope,
    process_document,
)
from credit_ocr_backend_spark.core.fields import map_items_to_fields  # noqa: E402
from credit_ocr_backend_spark.core.htmlparse import parse_page  # noqa: E402
from credit_ocr_backend_spark.sources.pages import build_page  # noqa: E402

GOLDEN_DIR = REPO / "tests" / "goldens"
GOLDEN_KEYS = [0, 3, 10, 21]


class DeterministicMapperClient:
    """Fake OllamaClient: 'generates' the engine's deterministic
    alias-mapper output as a JSON string — the pipeline's documented
    replacement for the reference's LLM mapping step."""

    def __init__(self, doc_config):
        self._cfg = doc_config

    async def generate(self, prompt: str) -> str:  # signature per client.py
        # The prompt embeds the items; we re-derive the mapping from the
        # items captured at call-site instead (set per document below).
        return json.dumps(self._mapping, ensure_ascii=False)

    def set_items(self, items):
        self._mapping = map_items_to_fields(items, self._cfg)


def reference_document(k: int, eng_cfg) -> dict:
    """Run the reference pipeline (tokens -> items -> extraction) for
    generated page k and return the golden payload dict."""
    page = build_page(k)
    tokens, extracted_text = parse_page(page["html"])

    items = ref_post.normalize_ocr_lines(tokens)

    ref_cfg = ref_fx.DocumentTypeConfig(
        name=eng_cfg.name,
        expected_fields=list(eng_cfg.expected_fields),
        field_descriptions=dict(eng_cfg.field_descriptions),
        validation_rules=dict(eng_cfg.validation_rules),
        field_mappings=dict(eng_cfg.field_mappings),
    )
    llm = DeterministicMapperClient(eng_cfg)
    llm.set_items(items)
    extraction = asyncio.run(
        ref_fx.extract_fields_with_llm(
            items, ref_cfg, llm, original_ocr_lines=tokens
        )
    )
    return {
        "url": page["url"],
        "status": "done",
        "extracted_text": extracted_text,
        "items": items,
        "extraction": extraction,
    }


def main() -> int:
    check = "--check" in sys.argv
    eng_cfg = default_config()
    failures = 0
    for k in GOLDEN_KEYS:
        payload = reference_document(k, eng_cfg)
        ref_bytes = dumps_envelope(payload)

        page = build_page(k)
        eng = process_document(page["url"], page["html"], eng_cfg)
        eng_bytes = dumps_envelope(
            {
                "url": eng["url"],
                "status": eng["status"],
                "extracted_text": eng["extracted_text"],
                "items": eng["items"],
                "extraction": eng["extraction"],
            }
        )
        same = ref_bytes == eng_bytes
        print(f"doc_{k}: reference==engine byte-identical: {same}"
              f" ({len(ref_bytes)} bytes)")
        if not same:
            failures += 1
            # first divergence for debugging
            for i, (a, b) in enumerate(zip(ref_bytes, eng_bytes)):
                if a != b:
                    print(f"  first diff at byte {i}:"
                          f" ref …{ref_bytes[max(0,i-60):i+60]!r}…"
                          f" eng …{eng_bytes[max(0,i-60):i+60]!r}…")
                    break
            else:
                print(f"  length diff: ref {len(ref_bytes)} eng {len(eng_bytes)}")
        if not check:
            (GOLDEN_DIR / f"doc_{k}.json").write_text(ref_bytes, encoding="utf-8")
    if not check:
        print(f"wrote {len(GOLDEN_KEYS)} reference-generated goldens to {GOLDEN_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
